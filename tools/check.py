#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT engine code —
the Scala engine never touches DuckDB; this script exists so mismatches
are caught before the round verify).

Usage: python3 tools/check.py <sfDir> <outDir> [--approx]
  - expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  - loads each <outDir>/<name> parquet (Spark result)
  - runs <outDir>/oracle_sql.json[name] in DuckDB over <sfDir> tables
  - compares: column names (sorted), row count, and cell values with
    rows sorted by all columns; floats BIT-EXACT by default (packed
    little-endian doubles, so +0.0 != -0.0; both-NaN counts equal) —
    the driver hashes exactly, and the r15 1e-9 tolerance here let a
    driver-red float column (t71 w_rank) ship as "pass". `--approx`
    restores the old 1e-9-relative mode for debugging only; the
    pre-commit loop MUST run the default.
"""
import argparse
import decimal
import json
import math
import struct

import duckdb

APPROX = False

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            ok, msg = compare(got, want)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"exception: {e}"
        if ok:
            n_pass += 1
            print(f"PASS {name} ({msg})")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


def compare(got, want):
    gcols, wcols = sorted(got.column_names), sorted(want.column_names)
    if gcols == ["__error"]:
        # Verify's explicit fail row for a query that erred Spark-side
        err = got.column("__error").to_pylist()
        return False, f"spark error: {err[0] if err else '?'}"
    # The DRIVER's checker sorts with pandas sort_values, which dies on
    # array/map/struct cells (r12: t41b/t44). Reject non-scalar columns
    # outright so this dev mirror agrees with the driver by construction
    # instead of silently passing what the driver would err on.
    import pyarrow.types as pt
    for tbl, side in ((got, "spark"), (want, "oracle")):
        for field in tbl.schema:
            t = field.type
            if (pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t)
                    or pt.is_map(t) or pt.is_struct(t)):
                return False, (f"non-scalar column {side}.{field.name}: {t} — "
                               "serialize with array_join/concat_ws "
                               "(f15 convention)")
            # VERDICT r16 item 2, schema-level contract: NO decimal column
            # may be emitted on either side. Spark never writes decimal
            # here, and a DuckDB decimal means an uncast SUM (HUGEINT /
            # decimal128) — the exact physical-type seam that reds the
            # driver's type-sensitive hash while every cell VALUE matches
            # (r16: t71/t71b). Fail loudly before the round, not at the
            # driver.
            if pt.is_decimal(t):
                return False, (f"decimal column {side}.{field.name}: {t} — "
                               "DuckDB SUM(BIGINT) is HUGEINT; CAST the "
                               "emitted column to BIGINT (t57d discipline)")
    if gcols != wcols:
        return False, f"columns differ: spark={gcols} oracle={wcols}"
    if got.num_rows != want.num_rows:
        return False, f"row count differs: spark={got.num_rows} oracle={want.num_rows}"
    g = sort_rows(got, gcols)
    w = sort_rows(want, wcols)
    n_exact = n_approx = 0
    for ci, cname in enumerate(gcols):
        for ri in range(len(g[0])):
            a, b = g[ci][ri], w[ci][ri]
            # a float OR Decimal on ONE side only is a column-TYPE seam
            # (Spark DOUBLE vs oracle BIGINT, Spark int64 vs oracle
            # HUGEINT/decimal128): the driver's exact hash distinguishes
            # 2.0 from 2 AND Decimal(2) from 2 — Python's loose == is
            # True for both (Decimal(5) == 5 is how the r16 t71 red
            # sailed through this mirror), so neither may pass it.
            # NOTE: the Decimal arm is second-line defense only — the
            # schema gate above already rejects any decimal COLUMN, so
            # a Decimal cell can only reach here if a non-decimal Arrow
            # column ever yields one (defense in depth, not the primary
            # guard)
            for kind in (float, decimal.Decimal):
                if isinstance(a, kind) != isinstance(b, kind) \
                        and a is not None and b is not None:
                    return False, (f"type mismatch col={cname} row={ri}: "
                                   f"spark={a!r} ({type(a).__name__}) "
                                   f"oracle={b!r} ({type(b).__name__})")
            if isinstance(a, float) and isinstance(b, float):
                # bit-exact: distinguishes +0.0/-0.0; both-NaN equal
                if math.isnan(a) and math.isnan(b):
                    n_exact += 1
                    continue
                if struct.pack("<d", a) == struct.pack("<d", b):
                    n_exact += 1
                    continue
                if APPROX and abs(a - b) <= 1e-9 * max(abs(a), abs(b)):
                    n_approx += 1  # near but not exact — count separately
                    continue
                return False, (f"cell mismatch col={cname} row={ri}: "
                               f"spark={a!r} oracle={b!r} "
                               f"(bit-exact float compare)")
            if a == b or (a is None and b is None):
                n_exact += 1
                continue
            return False, (f"cell mismatch col={cname} row={ri}: "
                           f"spark={a!r} oracle={b!r}")
    total = len(gcols) * (len(g[0]) if g else 0)
    ap = f" approx_cells={n_approx}" if n_approx else ""
    return True, f"rows={want.num_rows} exact_cells={n_exact}/{total}{ap}"


def sort_rows(tbl, cols):
    pycols = [tbl.column(c).to_pylist() for c in cols]
    rows = list(zip(*pycols)) if pycols and pycols[0] is not None else []
    rows.sort(key=lambda r: tuple(
        (x is None, str(type(x)), str(x)) for x in r))
    return [list(c) for c in zip(*rows)] if rows else [[] for _ in cols]


if __name__ == "__main__":
    # argparse (ADVICE r16): `check.py --approx sf out` used to mis-bind
    # sf_dir to '--approx' with the old positional sys.argv reads
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--approx", action="store_true",
                    help="debug-only 1e-9-relative float mode; the "
                         "pre-commit loop MUST run the default")
    ns = ap.parse_args()
    APPROX = ns.approx
    raise SystemExit(main(ns.sf_dir, ns.out_dir))

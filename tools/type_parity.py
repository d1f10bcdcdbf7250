#!/usr/bin/env python3
"""Dev-only cross-engine TYPE parity sweep (VERDICT r16 item 3).

The driver's correctness hash proved sensitive to the PHYSICAL Arrow
type, not just cell values (r16: DuckDB HUGEINT vs Spark int64 redded
t71/t71b with zero differing cells). check.py now rejects decimal
columns and float/Decimal-vs-int cells, but other type seams could in
principle exist. This sweep makes the whole surface auditable: for
every query in a Verify dump it compares the Spark parquet's Arrow
schema against the DuckDB oracle output's Arrow schema column by
column and buckets every divergence:

  - BENIGN (whitelisted, adjudicated once here):
      * string vs large_string — same logical type; the driver reads
        both sides through pandas object cells, which erases the
        large/small offset distinction (values are Python str either
        way), and DuckDB emits large_string unconditionally — every
        string column in every green round crossed this seam.
      * int64 vs int32/uint32 etc. DO NOT occur (Spark emits int64
        for LongType, int32 for IntegerType; oracles CAST to BIGINT) —
        if one appears it is flagged, not whitelisted.
  - FLAGGED: anything else (decimal anywhere, int-width or signedness
    mismatch, float vs int, timestamp unit skew, ...).

Usage: python3 tools/type_parity.py <sfDir> <outDir>
Exit 1 if anything is FLAGGED. Summary table suitable for COVERAGE.
"""
import argparse
import collections
import json

import duckdb
import pyarrow.types as pt

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def bucket(gt, wt) -> str:
    if gt.equals(wt):
        return "identical"
    both_str = all(pt.is_string(t) or pt.is_large_string(t)
                   for t in (gt, wt))
    if both_str:
        return "benign:string-vs-large_string"
    return "FLAGGED"


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    counts = collections.Counter()
    type_pairs = collections.Counter()
    flagged = []
    for name, sql in sorted(oracles.items()):
        got = con.execute(
            f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
        ).fetch_arrow_table()
        want = con.execute(sql).fetch_arrow_table()
        gf = {f.name: f.type for f in got.schema}
        wf = {f.name: f.type for f in want.schema}
        for cname in sorted(set(gf) | set(wf)):
            if cname not in gf or cname not in wf:
                flagged.append((name, cname, gf.get(cname, "MISSING"),
                                wf.get(cname, "MISSING")))
                counts["FLAGGED"] += 1
                continue
            b = bucket(gf[cname], wf[cname])
            counts[b] += 1
            type_pairs[(str(gf[cname]), str(wf[cname]), b)] += 1
            if b == "FLAGGED":
                flagged.append((name, cname, gf[cname], wf[cname]))
    print("== type-pair inventory (spark, oracle, bucket) -> n cols ==")
    for (g, w, b), n in sorted(type_pairs.items(),
                               key=lambda kv: -kv[1]):
        print(f"  {g:28s} {w:28s} {b:32s} {n}")
    print(f"== columns: {sum(counts.values())} total — "
          + ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    if flagged:
        print("== FLAGGED divergences ==")
        for name, cname, g, w in flagged:
            print(f"  {name}.{cname}: spark={g} oracle={w}")
    return 1 if flagged else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ns = ap.parse_args()
    raise SystemExit(main(ns.sf_dir, ns.out_dir))

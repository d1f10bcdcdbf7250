package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator queries (SURVEY.md §2.2–§2.5 ◆ rows) cast onto
  * the driver's TPC-H-ish tables (FIXTURES.md §B mapping).
  *
  * Float discipline: double sums are order-dependent, so every SUM goes
  * through an exact DECIMAL cast (the source values carry ≤2 decimal
  * digits; products of two/three of them ≤6) and back to double — both
  * Spark and DuckDB then compute the identical exact sum regardless of
  * partitioning. This is also the 100 TB-safe formulation: decimal sums
  * are associative, so partial aggregation (map-side combine) stays on.
  */
object CoreQueries {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dec6(c: Column): Column = c.cast("decimal(28,6)")

  /** Q1 — pricing-summary aggregation (A-class groupBy/agg; TPC-H Q1
    * shape). Partial agg + 2-col group key: shuffles only the grouped
    * partials, never raw rows. */
  val q1PricingSummary: QuerySpec = QuerySpec.sql(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base"),
        sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax")))).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q3 — segment revenue top-10 (the TPC-H Q3 shape): two fact⋈fact
    * joins + grouped revenue + partial top-k. Revenue sums ride
    * DECIMAL (order-independent exact addition — the q1 convention;
    * a double SUM would be shuffle-order-dependent), and the final
    * top-10 is `orderBy().limit()` → TakeOrderedAndProject. Join
    * strategy is AQE's call: customer filter is selective enough to
    * broadcast at small sf, orders⋈lineitem is genuine fact⋈fact. */
  val q3TopOrders: QuerySpec = QuerySpec.sql(
    "q3_top_orders",
    """SELECT l.l_orderkey,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_date, o.o_orderpriority
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY l.l_orderkey, o_date, o.o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"),
        // o_orderdate is TIMESTAMP_NTZ — a yyyy-MM-dd string is the
        // timezone-free cross-engine form
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_orderpriority"))
      .agg(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_date"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-shape — local-supplier volume: the classic six-table join
    * (region → nation → customer → orders → lineitem → supplier with
    * the supplier-in-customer-nation constraint), revenue per nation
    * in one region and year.
    *
    * Scale story — the textbook dim-chain plan: the region filter
    * prunes nation, nation prunes customer, all three are DIM-sized so
    * every dim join broadcasts; orders carries a pushed date-range
    * predicate into its scan; the only big shuffle is orders⋈lineitem
    * (fact⋈fact). A planner that shuffled the facts against every dim
    * would move the corpus five times; this shape moves it once.
    * DECIMAL-exact revenue (the q1/q3 discipline) cast to double only
    * at the end. */
  val q5LocalSupplier: QuerySpec = QuerySpec.sql(
    "q5_local_supplier",
    """SELECT n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM region r
      |JOIN nation n ON r.r_regionkey = n.n_regionkey
      |JOIN customer c ON n.n_nationkey = c.c_nationkey
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  AND s.s_nationkey = c.c_nationkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n.n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    Tables.region(s, d).filter(col("r_name") === "ASIA")
      .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey"))
      .join(Tables.customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
            && col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q18-shape — large-volume orders: filter on an AGGREGATE (HAVING
    * over the per-order lineitem quantity rollup), then join the
    * surviving keys back to orders and customer and keep the top-100
    * by price. The missing classic from the q1/q3 family: its
    * distinguishing plan property is that the selective predicate
    * exists only AFTER an aggregation, so pushdown can't help — the
    * scale story is the two-phase quantity rollup (map-side combine)
    * followed by a HAVING output small enough that AQE broadcasts it
    * against orders (fact-sized scan, dim-sized join input), then
    * TakeOrderedAndProject for the top-k. The oracle casts the SUM to
    * BIGINT inside the CTE — DuckDB's bare integer SUM is HUGEINT
    * (the s2/t29 trap). */
  val q18BigOrders: QuerySpec = QuerySpec.sql(
    "q18_big_orders",
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 200
      |)
      |SELECT c.c_custkey, c.c_name, o.o_orderkey,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
      |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
      |  b.total_qty
      |FROM big b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY total_price DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > 200)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        dec2(col("o_totalprice")).cast("double").as("total_price"),
        col("total_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
      .limit(100)
  }

  /** P1/U1 — union with group discriminator (the reference's
    * Company++Branches record stream, core/printers.py:6-17); schemas
    * differ so `unionByName(allowMissingColumns=true)` fills the gap. */
  val p1UnionGroups: QuerySpec = QuerySpec.sql(
    "p1_union_groups",
    """SELECT 'customer' AS party_group, c_custkey AS id, c_name AS name,
      |       CAST(c_nationkey AS INT) AS nationkey, c_acctbal AS acctbal,
      |       c_mktsegment AS segment
      |FROM customer
      |UNION ALL
      |SELECT 'supplier', s_suppkey, s_name, CAST(s_nationkey AS INT),
      |       s_acctbal, CAST(NULL AS VARCHAR)
      |FROM supplier
      |ORDER BY party_group, id""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).select(
      lit("customer").as("party_group"), col("c_custkey").as("id"),
      col("c_name").as("name"), col("c_nationkey").cast("int").as("nationkey"),
      col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"))
    val supp = Tables.supplier(s, d).select(
      lit("supplier").as("party_group"), col("s_suppkey").as("id"),
      col("s_name").as("name"), col("s_nationkey").cast("int").as("nationkey"),
      col("s_acctbal").as("acctbal"))
    cust.unionByName(supp, allowMissingColumns = true)
      .orderBy("party_group", "id")
  }

  /** P3 — bad-value filter ahead of an expensive source (the bad-IP
    * screen, core/printers.py:26-36): normalize then drop sentinel
    * values. The predicate is a plain Catalyst filter → pushed to the
    * parquet scan. */
  val p3ValidFilter: QuerySpec = QuerySpec.sql(
    "p3_valid_filter",
    """SELECT event_id, user_id, event_type
      |FROM events
      |WHERE lower(trim(event_type)) NOT IN ('', '-', 'n/a', 'na', 'none', 'null', 'error')
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val bad = Seq("", "-", "n/a", "na", "none", "null", "error")
    Tables.events(s, d)
      .filter(!lower(trim(col("event_type"))).isin(bad: _*))
      .select("event_id", "user_id", "event_type")
      .orderBy("event_id")
  }

  /** P4 — model-set membership filter (core/printers.py:38-40): the
    * literal set becomes Catalyst `In`/`InSet`, evaluated at the scan. */
  val p4ModelFilter: QuerySpec = QuerySpec.sql(
    "p4_model_filter",
    """SELECT p_partkey, p_name, p_brand, p_type
      |FROM part
      |WHERE lower(trim(p_type)) IN ('economy', 'small')
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      // the explicit isNotNull is semantically free (IN over null yields
      // null anyway) but parquet-PUSHABLE — the wrapped lower(trim())
      // predicate itself cannot reach the scan
      .filter(col("p_type").isNotNull &&
        lower(trim(col("p_type"))).isin("economy", "small"))
      .select("p_partkey", "p_name", "p_brand", "p_type")
      .orderBy("p_partkey")
  }

  /** P5 — the --only-ip point filter + scan write-back
    * (toner_hp.py:49-67): selection is normalized-IP equality ALONE —
    * no good-ip screen, no model screen (Type is deliberately outside
    * the target set on some selected rows) — and every matching row is
    * processed; a selected row whose probe yields nothing takes the
    * except-branch (status offline, cartridges []). Probe A's target
    * has a scan answer, probe B's does not. The synthesis pads some
    * "Printer IP" cells with \t...\n (str.strip parity — Spark trim
    * would diverge) and blanks "Printer IP" on k%7==0 rows so norm_ip's
    * truthy key scan falls through to "IP" (core/printers.py:28-33).
    * Both target classes k≡6 and k≡21 (mod 30) hit only via the padded
    * or fallback variants, so the oracle's residue predicate is the
    * hand-derived reference outcome. */
  val p5OnlyIp: QuerySpec = QuerySpec.sql(
    "p5_only_ip",
    """SELECT * FROM (
      |  SELECT 'A' AS probe, c_custkey AS pid, '10.0.0.6' AS ip,
      |         'online' AS status, 'Black,Cyan' AS carts
      |  FROM customer WHERE c_custkey % 30 = 6
      |  UNION ALL
      |  SELECT 'B' AS probe, c_custkey AS pid, '10.0.0.21' AS ip,
      |         'offline' AS status, '' AS carts
      |  FROM customer WHERE c_custkey % 30 = 21
      |)
      |ORDER BY probe, pid""".stripMargin) { (s, d) =>
    import graft.ops.ScanMerge
    import graft.sources.DocumentIngest
    val k = col("c_custkey")
    val cartT = "array<struct<cartridge:string>>"
    val printers = Tables.customer(s, d).select(
      k.as("pid"),
      when(k % 3 === 0, "FooModel").when(k % 3 === 1, "M404dn")
        .otherwise("").as("Type"),
      when(k % 7 === 0, lit(""))
        .when(k % 5 === 0, concat(lit("10.0.0."), (k % 30).cast("string")))
        .when(k % 5 === 1,
          concat(lit("\t10.0.0."), (k % 30).cast("string"), lit("\n")))
        .otherwise(concat(lit("192.168.1."), k.cast("string")))
        .as("Printer IP"),
      when(k % 7 === 0, concat(lit("10.0.0."), (k % 30).cast("string")))
        .as("IP"),
      struct(lit("idle").as("status"),
        array().cast(cartT).as("cartridges")).as("printerInfo"))
    val results = Tables.customer(s, d).limit(1).select(
      lit("10.0.0.6").as("ip"), lit("online").as("status"),
      array(struct(lit("Black").as("cartridge")),
        struct(lit("Cyan").as("cartridge"))).as("cartridges"))
    def probe(tag: String, target: String, r: DataFrame): DataFrame = {
      val merged = ScanMerge(printers, r,
        DocumentIngest.ipOf(printers) === lit(target))
      merged.where(DocumentIngest.ipOf(merged) === lit(target))
        .select(lit(tag).as("probe"), col("pid"), lit(target).as("ip"),
          col("printerInfo.status").as("status"),
          array_join(transform(col("printerInfo.cartridges"),
            c => c.getField("cartridge")), ",").as("carts"))
    }
    probe("A", "10.0.0.6", results)
      .unionByName(probe("B", "10.0.0.21", results.where(lit(false))))
      .orderBy("probe", "pid")
  }

  /** P6 — first-non-null/blank projection (`coalesce` IP pick,
    * core/printers.py:28-33) exercised over a regexp field extract. */
  val p6CoalesceNorm: QuerySpec = QuerySpec.sql(
    "p6_coalesce_norm",
    """SELECT event_id,
      |  trim(coalesce(nullif(regexp_extract(props, '"k": (\d+)', 1), ''), '0')) AS k_str
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        trim(coalesce(
          nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit("")),
          lit("0"))).as("k_str"))
      .orderBy("event_id")
  }

  /** J1 — small-dimension enrich join (employees→branches,
    * core/enrich/employees.py:4-34): customer ⋈ nation ⋈ region with
    * both dims broadcast (they are tiny at every SF — no shuffle of the
    * fact side), plus the reference's non-empty-wins update rule. */
  val j1EnrichJoin: QuerySpec = QuerySpec.sql(
    "j1_enrich_join",
    """SELECT c_custkey, c_name, n_name AS nation, r_name AS region,
      |  CASE WHEN length(trim(coalesce(r_name, ''))) > 0 THEN r_name
      |       ELSE c_mktsegment END AS zone
      |FROM customer
      |LEFT JOIN nation ON c_nationkey = n_nationkey
      |LEFT JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d)
    cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        col("c_custkey"), col("c_name"),
        col("n_name").as("nation"), col("r_name").as("region"),
        when(length(trim(coalesce(col("r_name"), lit("")))) > 0, col("r_name"))
          .otherwise(col("c_mktsegment")).as("zone"))
      .orderBy("c_custkey")
  }

  /** J2/W1 — per-group first-seen-ordered distinct pairs, ranks 1–2
    * (the locations enrich, core/enrich/locations.py:57-78,93-103).
    * Determinism: "first seen" is anchored to min(o_orderkey), an
    * explicit ordering column — never a bare `first()` (SURVEY §4.3). */
  val j2OrderedPairs: QuerySpec = QuerySpec.sql(
    "j2_ordered_pairs",
    """WITH pairs AS (
      |  SELECT o_custkey, o_orderpriority, o_orderstatus,
      |         MIN(o_orderkey) AS first_seen, COUNT(*) AS n_orders
      |  FROM orders
      |  GROUP BY o_custkey, o_orderpriority, o_orderstatus
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY first_seen) AS rn
      |  FROM pairs
      |)
      |SELECT o_custkey, rn, o_orderpriority, o_orderstatus, first_seen AS line_id, n_orders
      |FROM ranked WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val pairs = Tables.orders(s, d)
      .groupBy("o_custkey", "o_orderpriority", "o_orderstatus")
      .agg(min("o_orderkey").as("first_seen"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy("o_custkey").orderBy("first_seen")
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("rn"), col("o_orderpriority"),
        col("o_orderstatus"), col("first_seen").as("line_id"), col("n_orders"))
      .orderBy("o_custkey", "rn")
  }

  /** J3 — last-wins id-map build + keyed upsert join
    * (update_from_json.py:126-135,187-212): per order, the LAST lineitem
    * (by linenumber) wins; left-join back and coalesce-update. At lake
    * scale this is the MERGE INTO pattern; last-wins is made
    * deterministic with an explicit ordering column. */
  val j3LastWinsUpsert: QuerySpec = QuerySpec.sql(
    "j3_last_wins_upsert",
    """WITH idmap AS (
      |  SELECT l_orderkey, l_partkey, l_suppkey
      |  FROM (
      |    SELECT l_orderkey, l_partkey, l_suppkey,
      |           ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |                              ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
      |    FROM lineitem
      |  ) WHERE rn = 1
      |)
      |SELECT o_orderkey, o_orderstatus,
      |  coalesce(l_partkey, -1) AS last_part,
      |  coalesce(l_suppkey, -1) AS last_supp
      |FROM orders LEFT JOIN idmap ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber").desc, col("l_partkey").desc, col("l_suppkey").desc)
    val idmap = Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "l_linenumber")
    Tables.orders(s, d)
      .join(idmap, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"), col("o_orderstatus"),
        coalesce(col("l_partkey"), lit(-1L)).as("last_part"),
        coalesce(col("l_suppkey"), lit(-1L)).as("last_supp"))
      .orderBy("o_orderkey")
  }

  /** J4 — equi-join on defaulted keys (supplies⋈colorant with (1,0)
    * defaults, adapters/snmp_toner.py:112-129): null join keys are
    * coalesced to defaults *before* the join so they still match. */
  val j4DefaultKeyJoin: QuerySpec = QuerySpec.sql(
    "j4_default_key_join",
    """SELECT s_suppkey, s_name, n_name,
      |  coalesce(s_acctbal, 0.0) AS acctbal
      |FROM supplier
      |LEFT JOIN nation ON coalesce(s_nationkey, 0) = n_nationkey
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        coalesce(col("s_nationkey"), lit(0)) === col("n_nationkey"), "left")
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        coalesce(col("s_acctbal"), lit(0.0)).as("acctbal"))
      .orderBy("s_suppkey")
  }

  /** A1 — triple→row pivot (SNMP OID table reshape,
    * adapters/snmp_toner.py:91-105): explicit pivot value list keeps the
    * plan single-pass (no distinct-values pre-query) — required at scale. */
  val a1PivotEvents: QuerySpec = QuerySpec.sql(
    "a1_pivot_events",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val types = Seq("click", "view", "purchase", "signup", "error")
    val ev = Tables.events(s, d)
    val pivoted = ev.groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    val totals = ev.groupBy("user_id")
      .agg(sum(dec2(col("value"))).cast("double").as("total_value"))
    pivoted.na.fill(0L, types)
      .join(totals, Seq("user_id"))
      .orderBy("user_id")
  }

  /** A2 — severity-priority argmax (adapters/snmp_alerts.py:152-179):
    * rank rows by a severity ladder, break ties by arrival order, keep
    * the top row per key; final severity collapses to critical/warning/info. */
  val a2SeverityArgmax: QuerySpec = QuerySpec.sql(
    "a2_severity_argmax",
    """WITH ranked AS (
      |  SELECT user_id, event_id, event_type,
      |    CASE event_type WHEN 'error' THEN 4 WHEN 'purchase' THEN 3
      |         WHEN 'signup' THEN 2 WHEN 'view' THEN 1 ELSE 0 END AS sev_rank,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CASE event_type WHEN 'error' THEN 4 WHEN 'purchase' THEN 3
      |               WHEN 'signup' THEN 2 WHEN 'view' THEN 1 ELSE 0 END DESC,
      |               event_id ASC) AS rn
      |  FROM events WHERE value IS NOT NULL
      |)
      |SELECT user_id, event_id, event_type,
      |  CASE WHEN sev_rank >= 4 THEN 'critical'
      |       WHEN sev_rank >= 3 THEN 'warning'
      |       ELSE 'informational' END AS severity
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val sevRank = expr(
      """CASE event_type WHEN 'error' THEN 4 WHEN 'purchase' THEN 3
        |WHEN 'signup' THEN 2 WHEN 'view' THEN 1 ELSE 0 END""".stripMargin)
    val w = Window.partitionBy("user_id")
      .orderBy(col("sev_rank").desc, col("event_id").asc)
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .withColumn("sev_rank", sevRank)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        when(col("sev_rank") >= 4, "critical")
          .when(col("sev_rank") >= 3, "warning")
          .otherwise("informational").as("severity"))
      .orderBy("user_id")
  }

  /** A5 — first-seen dedup on a full key (EWS alert dedup,
    * adapters/ews_alerts.py:74-79): keep the earliest row per
    * (user_id, event_type) with an explicit (ts, event_id) order. */
  val a5DedupFirstSeen: QuerySpec = QuerySpec.sql(
    "a5_dedup_first_seen",
    """SELECT user_id, event_type, event_id AS first_event_id, value
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts, event_id) AS rn
      |  FROM events
      |) WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"), col("value"))
      .orderBy("user_id", "event_type")
  }

  /** A6 — group-representative probe (one SNMP probe per printer model,
    * plugins/tonerType/toner_type_snmp.py:61-94): per group pick the
    * deterministic representative and broadcast it to members. */
  val a6GroupRepresentative: QuerySpec = QuerySpec.sql(
    "a6_group_representative",
    """WITH rep AS (
      |  SELECT p_brand, MIN(p_partkey) AS rep_key, COUNT(*) AS members
      |  FROM part GROUP BY p_brand
      |)
      |SELECT r.p_brand, r.rep_key, p.p_name AS rep_name, r.members
      |FROM rep r JOIN part p ON r.rep_key = p.p_partkey
      |ORDER BY r.p_brand""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
    val rep = part.groupBy("p_brand")
      .agg(min("p_partkey").as("rep_key"), count(lit(1)).as("members"))
    rep.join(part.select(col("p_partkey"), col("p_name").as("rep_name")),
        col("rep_key") === col("p_partkey"))
      .select(col("p_brand"), col("rep_key"), col("rep_name"), col("members"))
      .orderBy("p_brand")
  }

  /** A7/A10 — first-seen-ordered distinct values joined for display
    * (cartridge colors, plugins/openticket/TonerOrder.py:50-57 +
    * update_from_json.py:114-123): per order, distinct return flags in
    * linenumber order, comma-joined. */
  val a7OrderedDistinct: QuerySpec = QuerySpec.sql(
    "a7_ordered_distinct",
    """WITH firsts AS (
      |  SELECT l_orderkey, l_returnflag, MIN(l_linenumber) AS first_ln
      |  FROM lineitem GROUP BY l_orderkey, l_returnflag
      |)
      |SELECT l_orderkey,
      |  string_agg(l_returnflag, ',' ORDER BY first_ln, l_returnflag) AS flags
      |FROM firsts GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_orderkey", "l_returnflag")
      .agg(min("l_linenumber").as("first_ln"))
      .groupBy("l_orderkey")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("first_ln"), col("l_returnflag")))),
          x => x.getField("l_returnflag")),
        ",").as("flags"))
      .orderBy("l_orderkey")
  }

  /** A8 — pair dedup + fixed-rank sort (toner code pairs,
    * adapters/toner_type_snmp.py:90-107). */
  val a8CodePairs: QuerySpec = QuerySpec.sql(
    "a8_code_pairs",
    """SELECT DISTINCT l_returnflag, l_linestatus,
      |  CASE l_returnflag WHEN 'R' THEN 0 WHEN 'A' THEN 1 ELSE 2 END AS flag_rank
      |FROM lineitem
      |ORDER BY flag_rank, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        when(col("l_returnflag") === "R", 0)
          .when(col("l_returnflag") === "A", 1)
          .otherwise(2).as("flag_rank"))
      .dropDuplicates("l_returnflag", "l_linestatus")
      .orderBy("flag_rank", "l_linestatus")
  }

  /** A12 — header-row election (scan a bounded prefix, score candidate
    * rows, argmax; core/excel/update_from_json.py:137-162): per user,
    * among the first 20 events, elect the modal event_type
    * (ties → lexicographically first). */
  val a12HeaderElection: QuerySpec = QuerySpec.sql(
    "a12_header_election",
    """WITH prefix AS (
      |  SELECT user_id, event_type,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
      |  FROM events
      |), scored AS (
      |  SELECT user_id, event_type, COUNT(*) AS score
      |  FROM prefix WHERE idx <= 20
      |  GROUP BY user_id, event_type
      |), elected AS (
      |  SELECT user_id, event_type, score,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |                            ORDER BY score DESC, event_type ASC) AS rn
      |  FROM scored
      |)
      |SELECT user_id, event_type AS elected_type, score
      |FROM elected WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val wIdx = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wElect = Window.partitionBy("user_id")
      .orderBy(col("score").desc, col("event_type").asc)
    Tables.events(s, d)
      .withColumn("idx", row_number().over(wIdx))
      .filter(col("idx") <= 20)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("score"))
      .withColumn("rn", row_number().over(wElect))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("elected_type"), col("score"))
      .orderBy("user_id")
  }

  /** W2 — natural-key sort (step2 < step10; core/pipeline.py:24-35):
    * split into (alpha prefix, numeric run) and sort numerically aware.
    * The sequential rank comes from [[graft.ops.GlobalRank]] (range
    * partition + per-partition offsets), NOT a PARTITION-BY-less
    * window — identical values, no single-partition sort at scale. */
  val w2NaturalSort: QuerySpec = QuerySpec.sql(
    "w2_natural_sort",
    """SELECT ROW_NUMBER() OVER (ORDER BY
      |    lower(regexp_replace(c_name, '[0-9]+', '', 'g')),
      |    coalesce(TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT), -1),
      |    c_custkey) AS rn,
      |  c_custkey, c_name
      |FROM customer
      |ORDER BY rn""".stripMargin) { (s, d) =>
    val alphaKey = lower(regexp_replace(col("c_name"), "[0-9]+", ""))
    val numKey = coalesce(
      regexp_extract(col("c_name"), "([0-9]+)", 1).try_cast("long"), lit(-1L))
    graft.ops.GlobalRank.withGlobalRowNumber(
        Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
        "rn", alphaKey, numKey, col("c_custkey"))
      .select(col("rn"), col("c_custkey"), col("c_name"))
      .orderBy("rn")
  }

  val all: Seq[QuerySpec] = Seq(
    q1PricingSummary, q3TopOrders, q5LocalSupplier, q18BigOrders,
    p1UnionGroups, p3ValidFilter, p4ModelFilter,
    p5OnlyIp, p6CoalesceNorm, j1EnrichJoin, j2OrderedPairs, j3LastWinsUpsert,
    j4DefaultKeyJoin, a1PivotEvents, a2SeverityArgmax, a5DedupFirstSeen,
    a6GroupRepresentative, a7OrderedDistinct, a8CodePairs,
    a12HeaderElection, w2NaturalSort)
}

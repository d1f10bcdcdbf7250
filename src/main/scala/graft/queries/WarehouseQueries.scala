package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-operator pack: the aggregation/set/window machinery the
  * reference never had but an engine at lake scale must (SURVEY.md
  * §2.4/§2.5 "missing-vs-Spark" notes — grouping sets, set ops,
  * session windows are free in Spark; exposed here as oracle-checked
  * queries so the capability is verified, not just claimed). */
object WarehouseQueries {

  /** S2 — ROLLUP over (returnflag, linestatus) with grouping level:
    * partial-aggregate-friendly (map-side combine per level). */
  val s2Rollup: QuerySpec = QuerySpec.sql(
    "s2_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
      |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls, lvl""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast("long").as("lvl"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("lvl"), col("sum_qty"), col("n"))
      .orderBy("rf", "ls", "lvl")
  }

  /** S3 — set ops (absent from the reference, §2.5): customers active
    * in both statuses minus a third, via INTERSECT/EXCEPT. */
  val s3SetOps: QuerySpec = QuerySpec.sql(
    "s3_setops",
    """(SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      | INTERSECT
      | SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |EXCEPT
      |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    def keys(status: String) =
      o.where(col("o_orderstatus") === status).select("o_custkey").distinct()
    keys("O").intersect(keys("F")).except(keys("P")).orderBy("o_custkey")
  }

  /** S4 — session windows per user with a 10-minute gap
    * (session_window; oracle = gaps-and-islands lag/cumsum). Session
    * start is reported in MICROSECONDS: DuckDB reads the nanos
    * timestamp at micro resolution, and min() commutes with the
    * monotonic ns→µs truncation, so both engines agree exactly. Break
    * condition `>=` matches Spark's merge-while-diff-<-gap semantics. */
  val s4SessionWindow: QuerySpec = QuerySpec.sql(
    "s4_session_window",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |o AS (SELECT user_id, us,
      |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
      |            >= 600000000 THEN 1 ELSE 0 END AS brk FROM e),
      |s AS (SELECT user_id, us,
      |  SUM(brk) OVER (PARTITION BY user_id ORDER BY us
      |                 ROWS UNBOUNDED PRECEDING) AS sid FROM o)
      |SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("etime", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window(col("etime"), "10 minutes"), col("user_id"))
      // integer `div`, NOT `/`: ns epochs (~1.7e18) exceed double's
      // 53-bit mantissa, float division would corrupt low digits
      .agg(expr("min(ts) div 1000").as("session_start_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_us", "n_events")
      .orderBy("user_id", "session_start_us")
  }

  /** J7 — AS-OF join (point-in-time enrichment): each purchase gets
    * the same user's latest click at-or-before it, via
    * [[graft.ops.AsOfJoin]]'s union + carry-forward (no range-join
    * blow-up). Oracle: DuckDB's native ASOF LEFT JOIN over the same
    * tie-deduped right side — two independent formulations of the
    * same semantics. Timestamps are compared and emitted at µs
    * (`ts DIV 1000` vs `epoch_us`): DuckDB's parquet reader truncates
    * TIMESTAMP(NANOS) to µs, so µs is the finest cross-engine-exact
    * resolution — both engines then run the SAME as-of, ties
    * included. */
  val j7AsOfJoin: QuerySpec = QuerySpec.sql(
    "j7_asof_join",
    """WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      |           FROM events WHERE event_type = 'purchase'),
      |r0 AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
      |       FROM events WHERE event_type = 'click'),
      |r AS (SELECT user_id, ts_us, max(event_id) AS event_id,
      |        max_by(value, event_id) AS value FROM r0 GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id, l.ts_us, l.value,
      |  r.event_id AS asof_event_id, r.ts_us AS asof_ts_us,
      |  r.value AS asof_value
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts_us <= l.ts_us
      |ORDER BY l.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).withColumn("ts_us", expr("ts DIV 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    graft.ops.AsOfJoin(purchases, clicks, Seq("user_id"), "ts_us", "ts_us",
      payload = Seq("event_id", "ts_us", "value"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        col("asof_event_id"), col("asof_ts_us"), col("asof_value"))
      .orderBy("event_id")
  }

  /** S7 — CUBE over (status, priority): all four grouping sets in one
    * pass (the OLAP dashboard rollup s2's linear ROLLUP doesn't
    * cover). Spark expands grouping sets BEFORE the exchange, so the
    * partial aggregate still combines map-side — one shuffle carries
    * all 2^k set combinations. Parity: GROUPING() flags (cast to INT)
    * disambiguate "ALL" rows from genuine NULL keys, and the COALESCE
    * labels keep NULLs out of the ORDER BY (the engines disagree on
    * default NULL ordering); money goes through the DECIMAL cast
    * (q1 idiom). */
  val s7CubeProfile: QuerySpec = QuerySpec.sql(
    "s7_cube_profile",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority, status, priority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("g_status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_priority"), col("n_orders"), col("total_price"))
      .orderBy("g_status", "g_priority", "status", "priority")
  }

  /** J8 — event-time INTERVAL join, batch twin of
    * [[graft.streaming.IntervalJoin]] (left-outer attribution): each
    * purchase pairs with ALL the same user's clicks from the preceding
    * 6 hours, purchases with none come out with null click columns.
    * Unlike j7's as-of (latest one), this keeps every in-horizon match
    * — the "which clicks get credit" shape. Same µs convention as j7.
    * The nullable c_id is COALESCE'd in the sort key on both sides
    * because the engines disagree on default NULL ordering. */
  val j8IntervalJoin: QuerySpec = QuerySpec.sql(
    "j8_interval_join",
    """WITH p AS (SELECT event_id AS p_id, user_id AS p_user,
      |             epoch_us(ts) AS p_ts, value AS p_value
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_id, user_id AS c_user, epoch_us(ts) AS c_ts
      |      FROM events WHERE event_type = 'click')
      |SELECT p_id, p_user, p_ts, p_value, c_id, c_ts
      |FROM p LEFT JOIN c ON p_user = c_user
      |  AND c_ts <= p_ts AND c_ts >= p_ts - 21600000000
      |ORDER BY p_id, COALESCE(c_id, -1)""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).withColumn("us", expr("ts DIV 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("us").as("p_ts"), col("value").as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("us").as("c_ts"))
    graft.streaming.IntervalJoin
      .attributeBatchLeftOuter(purchases, clicks, horizonUs = 21600000000L)
      .select(col("p_id"), col("p_user"), col("p_ts"), col("p_value"),
        col("c_id"), col("c_ts"))
      .orderBy(col("p_id"), coalesce(col("c_id"), lit(-1L)))
  }

  /** S6 — EXACT per-group quantiles (p25/p50/p75 of event value) by
    * rank selection: row_number over the per-group sort, keep rank
    * `ceil(p·n)` — DuckDB `quantile_disc`'s convention, verified
    * empirically. The p values are dyadic (exactly representable), so
    * `p·n` and its ceil are bit-identical cross-engine; a 0.9-style p
    * would hit float-product ties at integer boundaries. Scale note:
    * exact quantiles NEED the per-group sort (each group lands in one
    * sort partition — fine for bounded-cardinality groups like
    * event_type); for unbounded groups the engine answer is
    * `approx_percentile`, which trades the sort for a sketch. */
  val s6ExactQuantiles: QuerySpec = QuerySpec.sql(
    "s6_exact_quantiles",
    """SELECT event_type, CAST(0.25 AS DOUBLE) AS p,
      |       quantile_disc(value, 0.25) AS q FROM events GROUP BY 1
      |UNION ALL
      |SELECT event_type, CAST(0.5 AS DOUBLE), quantile_disc(value, 0.5)
      |FROM events GROUP BY 1
      |UNION ALL
      |SELECT event_type, CAST(0.75 AS DOUBLE), quantile_disc(value, 0.75)
      |FROM events GROUP BY 1
      |ORDER BY event_type, p""".stripMargin) { (s, d) =>
    import s.implicits._
    val wSort = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value", "event_id")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    val ranked = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      // quantile_disc ignores NULLs; without this filter they'd both
      // inflate n and rank first (asc_nulls_first), shifting every rank
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(wSort))
      .withColumn("n", count(lit(1)).over(wAll))
    val pFrame = broadcast(Seq(0.25, 0.5, 0.75).toDF("p"))
    val qRows = ranked
      .crossJoin(pFrame)
      .filter(col("rn") === ceil(col("p") * col("n")))
      .select(col("event_type"), col("p"), col("value").as("q"))
    // quantile_disc over an all-NULL group is NULL, but GROUP BY still
    // emits the group — rebuild the full (event_type, p) frame from a
    // column-pruned distinct scan and left-join the quantiles back so
    // such a group yields (event_type, p, NULL) instead of vanishing.
    Tables.events(s, d).select("event_type").distinct()
      .crossJoin(pFrame)
      .join(qRows, Seq("event_type", "p"), "left")
      .select(col("event_type"), col("p"), col("q"))
      .orderBy("event_type", "p")
  }

  val all: Seq[QuerySpec] =
    Seq(s2Rollup, s3SetOps, s4SessionWindow, j7AsOfJoin, j8IntervalJoin,
      s6ExactQuantiles, s7CubeProfile)
}

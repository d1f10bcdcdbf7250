package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Normalize

/** Scalar-function operator queries (SURVEY.md §2.6 ◆ rows) — each
  * applies a `graft.functions.Normalize` Column function over testdata
  * and replicates the exact when-chain in the DuckDB oracle. All pure
  * codegen'd expressions: at 100 TB these run scan-local with zero
  * shuffle (the ORDER BY here is presentation-only for the hash gate).
  */
object FunctionQueries {

  /** F2 — canonicalize_id: "410.0"→"410" (numeric path, explicit trunc)
    * vs trim/newline-strip (string path). */
  val f2CanonicalizeId: QuerySpec = QuerySpec.sql(
    "f2_canonicalize_id",
    """WITH raws AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 2 = 0 THEN concat(CAST(o_custkey AS VARCHAR), '.0')
      |         ELSE concat('id-', CAST(o_custkey AS VARCHAR), chr(10)) END AS raw
      |  FROM orders
      |)
      |SELECT o_orderkey, raw,
      |  CASE WHEN TRY_CAST(raw AS DOUBLE) IS NOT NULL
      |       THEN CAST(CAST(TRUNC(TRY_CAST(raw AS DOUBLE)) AS BIGINT) AS VARCHAR)
      |       ELSE trim(regexp_replace(raw, '[\n\r]', ' ', 'g')) END AS canon_id
      |FROM raws
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0,
          concat(col("o_custkey").cast("string"), lit(".0")))
          .otherwise(concat(lit("id-"), col("o_custkey").cast("string"), lit("\n")))
          .as("raw"))
      .withColumn("canon_id", Normalize.canonicalizeId(col("raw")))
      .orderBy("o_orderkey")
  }

  /** F4 — substring-keyword status classification, online scan first,
    * then the "off"-before-"on" fallbacks (the chain order IS the
    * semantics — update_from_json.py:42-58). */
  val f4StatusClassify: QuerySpec = {
    def likes(keys: Seq[String]): String =
      keys.map(k => s"s LIKE '%$k%'").mkString(" OR ")
    QuerySpec.sql(
      "f4_status_classify",
      s"""WITH t AS (SELECT event_id, event_type,
         |  lower(trim(coalesce(event_type, ''))) AS s FROM events)
         |SELECT event_id, event_type,
         |  CASE
         |    WHEN ${likes(Normalize.OnlineKeys)} THEN 'online'
         |    WHEN ${likes(Normalize.OfflineKeys)} THEN 'offline'
         |    WHEN s LIKE '%off%' THEN 'offline'
         |    WHEN s LIKE '%on%' THEN 'online'
         |    ELSE 'offline' END AS status
         |FROM t
         |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        Normalize.statusOnlineOffline(col("event_type")).as("status"))
      .orderBy("event_id")
    }
  }

  /** F5 — dash_if_blank edge fill (nulls synthesized via nullif). */
  val f5DashIfBlank: QuerySpec = QuerySpec.sql(
    "f5_dash_if_blank",
    """SELECT o_orderkey,
      |  CASE WHEN nullif(o_orderstatus, 'O') IS NULL
      |            OR trim(nullif(o_orderstatus, 'O')) = '' THEN '-'
      |       ELSE nullif(o_orderstatus, 'O') END AS status_cell
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        Normalize.dashIfBlank(nullif(col("o_orderstatus"), lit("O"))).as("status_cell"))
      .orderBy("o_orderkey")
  }

  /** F7 — trailing-postal split: postal NULL when absent; separator
    * stripping only happens on a match (locations.py:27-36). */
  val f7PostalSplit: QuerySpec = QuerySpec.sql(
    "f7_postal_split",
    """SELECT c_custkey,
      |  nullif(regexp_extract(c_name, '(\d{7})\s*$', 1), '') AS postal,
      |  CASE WHEN nullif(regexp_extract(c_name, '(\d{7})\s*$', 1), '') IS NOT NULL
      |       THEN trim(regexp_replace(
      |              regexp_replace(c_name, '[\s,:\-]*\d{7}\s*$', '', 'g'),
      |              '[ ,:\-]+$', '', 'g'))
      |       ELSE trim(c_name) END AS cleaned
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val (postal, cleaned) = Normalize.splitPostal(col("c_name"))
    Tables.customer(s, d)
      .select(col("c_custkey"), postal.as("postal"), cleaned.as("cleaned"))
      .orderBy("c_custkey")
  }

  /** F9 — toner percent arithmetic: sentinel levels −1/−2/−3 → null
    * BEFORE the unit==19 clamp (snmp_toner.py:61-69 checks NEG_UNKNOWN
    * first), then clamp / ratio. Level l_quantity−4 spans [−3,46] so the
    * sentinel path is actually exercised; unit is 19 on even partkeys. */
  val f9PercentCompute: QuerySpec = QuerySpec.sql(
    "f9_percent_compute",
    """WITH t AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      |    CASE WHEN l_partkey % 2 = 0 THEN 19 ELSE l_linenumber END AS unit,
      |    l_quantity - 4 AS level
      |  FROM lineitem
      |)
      |SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
      |  CASE WHEN level IS NULL OR level IN (-1, -2, -3) THEN NULL
      |       WHEN unit = 19 THEN greatest(least(CAST(level AS BIGINT), 100), 0)
      |       WHEN 50 > 0 AND level >= 0
      |         THEN greatest(least(CAST(round(100.0 * level / 50) AS BIGINT), 100), 0)
      |       ELSE NULL END AS pct
      |FROM t
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        Normalize.computePercent(
          when(col("l_partkey") % 2 === 0, 19).otherwise(col("l_linenumber")),
          col("l_quantity") - 4, lit(50)).as("pct"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
  }

  /** F13 — OID structural parse: locate the 43.11.1.1 marker in a dotted
    * OID and pull (col, row) at fixed offsets — pure array built-ins. */
  val f13OidParse: QuerySpec = QuerySpec.sql(
    "f13_oid_parse",
    """WITH oids AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey,
      |    concat('1.3.6.1.2.1.43.11.1.1.', CAST(l_linenumber AS VARCHAR),
      |           '.1.', CAST(l_orderkey % 97 AS VARCHAR)) AS oid
      |  FROM lineitem
      |), parsed AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, oid,
      |         string_split(oid, '.') AS parts
      |  FROM oids
      |)
      |SELECT l_orderkey, l_linenumber, l_partkey, oid,
      |  CAST(parts[list_position(parts, '43') + 4] AS INT) AS oid_col,
      |  CAST(parts[list_position(parts, '43') + 6] AS INT) AS oid_row
      |FROM parsed
      |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        concat(lit("1.3.6.1.2.1.43.11.1.1."), col("l_linenumber").cast("string"),
          lit(".1."), (col("l_orderkey") % 97).cast("string")).as("oid"))
      .withColumn("parsed", Normalize.oidColRow(col("oid")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("oid"),
        col("parsed.col").as("oid_col"), col("parsed.row").as("oid_row"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  /** F15 — hrPrinterDetectedErrorState 15-bit decode → flag list +
    * severity (critical iff offline|serviceRequested). */
  val f15BitmaskFlags: QuerySpec = QuerySpec.sql(
    "f15_bitmask_flags", {
      val flagCases = Normalize.HrFlagNames.map { case (bit, name) =>
        s"CASE WHEN (event_id % 32768 >> $bit) & 1 = 1 THEN '$name' END"
      }.mkString(",\n      |    ")
      s"""SELECT event_id,
        |  concat_ws(',',
        |    $flagCases) AS flags,
        |  CASE WHEN event_id % 32768 = 0 THEN 'informational'
        |       WHEN (event_id % 32768 >> 6) & 1 = 1
        |            OR (event_id % 32768 >> 7) & 1 = 1 THEN 'critical'
        |       ELSE 'warning' END AS severity
        |FROM events
        |ORDER BY event_id""".stripMargin
    }) { (s, d) =>
    val mask = col("event_id") % 32768
    Tables.events(s, d)
      .select(col("event_id"),
        array_join(Normalize.hrFlags(mask), ",").as("flags"),
        Normalize.hrSeverity(mask).as("severity"))
      .orderBy("event_id")
  }

  /** F17 — triage chain: all-digit strings through the numeric
    * thresholds, else EXACT word-set membership (ews_alerts.py:14-32 —
    * `s in {...}`, not substring). */
  val f17Triage: QuerySpec = QuerySpec.sql(
    "f17_triage",
    """WITH base AS (
      |  SELECT event_id, event_type,
      |    regexp_extract(props, '"k": (\d+)', 1) AS k_raw
      |  FROM events
      |), n AS (
      |  SELECT event_id, event_type, k_raw,
      |    trim(coalesce(k_raw, '')) AS kt,
      |    lower(trim(coalesce(event_type, ''))) AS w
      |  FROM base
      |)
      |SELECT event_id, event_type, k_raw,
      |  CASE WHEN regexp_matches(kt, '^[0-9]+$') AND TRY_CAST(kt AS BIGINT) IS NULL
      |            THEN 'critical'
      |       WHEN regexp_matches(kt, '^[0-9]+$') AND TRY_CAST(kt AS BIGINT) >= 6
      |            THEN 'critical'
      |       WHEN regexp_matches(kt, '^[0-9]+$') AND TRY_CAST(kt AS BIGINT) >= 3
      |            THEN 'warning'
      |       WHEN regexp_matches(kt, '^[0-9]+$') THEN 'informational'
      |       ELSE 'informational' END AS k_severity,
      |  CASE WHEN w IN ('critical', 'fatal', 'severe', 'error') THEN 'critical'
      |       WHEN w IN ('attention', 'warning', 'warn') THEN 'warning'
      |       ELSE 'informational' END AS word_severity
      |FROM n
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_raw"))
      .select(col("event_id"), col("event_type"), col("k_raw"),
        Normalize.triage(col("k_raw")).as("k_severity"),
        Normalize.triage(col("event_type")).as("word_severity"))
      .orderBy("event_id")
  }

  /** F22 — regex field extraction over free text. */
  val f22RegexExtract: QuerySpec = QuerySpec.sql(
    "f22_regex_extract",
    """SELECT doc_id,
      |  regexp_extract(text, '([a-z]{7,})', 1) AS first_long_word,
      |  CAST((length(text) - length(replace(text, 'data', ''))) / 4 AS BIGINT) AS n_data
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract(col("text"), "([a-z]{7,})", 1).as("first_long_word"),
        ((length(col("text")) - length(regexp_replace(col("text"), "data", ""))) / 4)
          .cast("long").as("n_data"))
      .orderBy("doc_id")
  }

  /** A3 — best-event argmax with ties→LAST (LEDM election,
    * adapters/ledm_client.py:96-109): the `>=` keeps the latest max. */
  val a3BestEventLast: QuerySpec = QuerySpec.sql(
    "a3_best_event_last",
    """SELECT user_id, event_id, event_type, bucket
      |FROM (
      |  SELECT user_id, event_id, event_type,
      |    CAST(floor(value / 10) AS BIGINT) AS bucket,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY floor(value / 10) DESC, event_id DESC) AS rn
      |  FROM events WHERE value IS NOT NULL
      |)
      |WHERE rn = 1
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id")
      .orderBy(floor(col("value") / 10).desc, col("event_id").desc)
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .withColumn("bucket", floor(col("value") / 10).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "bucket")
      .orderBy("user_id")
  }

  /** A4 — global top-1 by (rank, has_code) with stable tie-break
    * (EWS best alert, adapters/ews_alerts.py:259-284): a LIMIT 1 over a
    * total order — Spark's TakeOrdered does this without a full sort. */
  val a4TopAlert: QuerySpec = QuerySpec.sql(
    "a4_top_alert",
    """SELECT event_id, user_id, event_type, value
      |FROM events
      |ORDER BY CASE event_type WHEN 'error' THEN 4 WHEN 'purchase' THEN 3
      |         WHEN 'signup' THEN 2 WHEN 'view' THEN 1 ELSE 0 END DESC,
      |         value DESC, event_id ASC
      |LIMIT 1""".stripMargin) { (s, d) =>
    val sevRank = expr(
      """CASE event_type WHEN 'error' THEN 4 WHEN 'purchase' THEN 3
        |WHEN 'signup' THEN 2 WHEN 'view' THEN 1 ELSE 0 END""".stripMargin)
    Tables.events(s, d)
      .orderBy(sevRank.desc, col("value").desc, col("event_id").asc)
      .limit(1)
      .select("event_id", "user_id", "event_type", "value")
  }

  /** F28 — deterministic RTL HTML ticket render (TonerOrder.py:152-195):
    * escape & < >, format a fixed RTL table from joined lookup fields. */
  val f28TicketRender: QuerySpec = QuerySpec.sql(
    "f28_ticket_render",
    """SELECT c_custkey,
      |  concat('<div dir="rtl"><table><tr><td>',
      |    replace(replace(replace(c_name, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
      |    '</td><td>', coalesce(n_name, '-'),
      |    '</td><td>', c_mktsegment,
      |    '</td></tr></table></div>') AS html
      |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_custkey < 20
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    Tables.customer(s, d)
      .filter(col("c_custkey") < 20)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey"),
        concat(lit("<div dir=\"rtl\"><table><tr><td>"), esc(col("c_name")),
          lit("</td><td>"), coalesce(col("n_name"), lit("-")),
          lit("</td><td>"), col("c_mktsegment"),
          lit("</td></tr></table></div>")).as("html"))
      .orderBy("c_custkey")
  }

  /** S-analogue — tumbling-window snapshot rollup on the event stream
    * (SURVEY §2.7): 1-hour windows via exact integer ns arithmetic (the
    * batch equivalent of the Structured Streaming query in
    * graft.streaming). */
  val s1WindowRollup: QuerySpec = QuerySpec.sql(
    "s1_window_rollup",
    """SELECT epoch_ns(ts) // 3600000000000 * 3600 AS window_start_s,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("window_start_s",
        expr("ts div 3600000000000") * 3600)
      .groupBy("window_start_s", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("window_start_s", "event_type")
  }

  val all: Seq[QuerySpec] = Seq(
    f2CanonicalizeId, f4StatusClassify, f5DashIfBlank, f7PostalSplit,
    f9PercentCompute, f13OidParse, f15BitmaskFlags, f17Triage,
    f22RegexExtract, a3BestEventLast, a4TopAlert, f28TicketRender,
    s1WindowRollup)
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Normalize
import graft.sources.EwsAlerts

/** Oracle coverage for the scalar functions that round 1 verified only
  * by spec (SURVEY.md §2.6 F6/F10/F12/F16/F18/F20/F23): each query
  * synthesizes adversarial inputs from testdata columns and replicates
  * the exact when-chain in DuckDB. All scan-local codegen'd
  * expressions — zero shuffle beyond the presentation ORDER BY. */
object ScalarQueries2 {

  /** F6 — sanitize_excel_value: strip XML-illegal control chars
    * (update_from_json.py:8-15); tab/CR/LF survive. */
  val f6Sanitize: QuerySpec = QuerySpec.sql(
    "f6_sanitize_cell",
    """SELECT p_partkey,
      |  regexp_replace(concat('a', chr(1), 'b', chr(11), chr(9), p_name, chr(31)),
      |                 '[\x01-\x08\x0B\x0C\x0E-\x1F]', '', 'g') AS cleaned
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        Normalize.sanitizeCell(
          concat(lit("a\u0001b\u000B\t"), col("p_name"), lit("\u001F")))
          .as("cleaned"))
      .orderBy("p_partkey")
  }

  /** F10 — `_pct_with_symbol`: int → "N%", null-through
    * (snmp_toner.py:71-72). */
  val f10PctSymbol: QuerySpec = QuerySpec.sql(
    "f10_pct_symbol",
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  CASE WHEN nullif(l_linenumber, 3) IS NULL THEN NULL
      |       ELSE concat(CAST(CAST(nullif(l_linenumber, 3) AS BIGINT) AS VARCHAR), '%')
      |  END AS pct
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        Normalize.pctWithSymbol(nullif(col("l_linenumber"), lit(3))).as("pct"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey")
  }

  /** F12 — `_to_text`: un-repr Python b'...' AND b"..." wrappers, the
    * single-quote branch first with if/elif short-circuit — a nested
    * b'b"x"' unwraps exactly once (snmp_toner.py:17-33,
    * toner_type_snmp.py:15-28). Synthesis covers both wrappers, the
    * nested case, and an unclosed wrapper that must pass through; NUL
    * stripping is pinned by NormalizeSpec (parquet-unfriendly here). */
  val f12ToText: QuerySpec = QuerySpec.sql(
    "f12_to_text",
    """WITH t AS (SELECT p_partkey,
      |  CASE p_partkey % 5
      |    WHEN 0 THEN concat('b''', p_brand, '''')
      |    WHEN 1 THEN concat('b"', p_brand, '"')
      |    WHEN 2 THEN concat('b''b"', p_brand, '"''')
      |    WHEN 3 THEN concat('b''', p_brand)
      |    ELSE p_brand END AS raw FROM part)
      |SELECT p_partkey, raw,
      |  CASE WHEN starts_with(raw, 'b''') AND ends_with(raw, '''')
      |         THEN substr(raw, 3, greatest(length(raw) - 3, 0))
      |       WHEN starts_with(raw, 'b"') AND ends_with(raw, '"')
      |         THEN substr(raw, 3, greatest(length(raw) - 3, 0))
      |       ELSE raw END AS text
      |FROM t
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        when(col("p_partkey") % 5 === 0,
          concat(lit("b'"), col("p_brand"), lit("'")))
          .when(col("p_partkey") % 5 === 1,
            concat(lit("b\""), col("p_brand"), lit("\"")))
          .when(col("p_partkey") % 5 === 2,
            concat(lit("b'b\""), col("p_brand"), lit("\"'")))
          .when(col("p_partkey") % 5 === 3,
            concat(lit("b'"), col("p_brand")))
          .otherwise(col("p_brand")).as("raw"))
      .withColumn("text", Normalize.toText(col("raw")))
      .orderBy("p_partkey")
  }

  /** F16 — `_clean_desc`: exact Hebrew→English translation then
    * lowercase suppression set → "" (snmp_alerts.py:36-50,74-82). */
  val f16CleanDesc: QuerySpec = {
    val transSql = Normalize.DescTranslations.map { case (k, v) =>
      s"WHEN '${k.replace("'", "''")}' THEN '${v.replace("'", "''")}'"
    }.mkString("\n      |    ")
    val suppSql = Normalize.SuppressedDescs.map(s => s"'$s'").mkString(", ")
    QuerySpec.sql(
      "f16_clean_desc",
      s"""WITH raw AS (SELECT doc_id,
         |  CASE doc_id % 5
         |    WHEN 0 THEN 'מושהה'
         |    WHEN 1 THEN '66044'
         |    WHEN 2 THEN 'Sleep Mode On'
         |    WHEN 3 THEN 'Genuine HP Cartridge Installed'
         |    ELSE concat('Fuser ', CAST(doc_id AS VARCHAR)) END AS d
         |FROM documents),
         |xl AS (SELECT doc_id,
         |  CASE trim(d)
         |    $transSql
         |    ELSE trim(d) END AS x
         |FROM raw)
         |SELECT doc_id,
         |  CASE WHEN lower(x) IN ($suppSql) THEN '' ELSE x END AS cleaned
         |FROM xl
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, "מושהה")
            .when(col("doc_id") % 5 === 1, "66044")
            .when(col("doc_id") % 5 === 2, "Sleep Mode On")
            .when(col("doc_id") % 5 === 3, "Genuine HP Cartridge Installed")
            .otherwise(concat(lit("Fuser "), col("doc_id").cast("string")))
            .as("d"))
        .select(col("doc_id"), Normalize.cleanDesc(col("d")).as("cleaned"))
        .orderBy("doc_id")
    }
  }

  /** F18 — `_severity_rank`: all-digit → int, else exact word tiers
    * 9/6/5/3/1/0 (ews_alerts.py:144-161). */
  val f18SeverityRank: QuerySpec = QuerySpec.sql(
    "f18_severity_rank",
    """WITH t AS (SELECT event_id,
      |  CASE event_id % 9
      |    WHEN 0 THEN 'FATAL' WHEN 1 THEN ' critical ' WHEN 2 THEN 'Severe'
      |    WHEN 3 THEN 'warning' WHEN 4 THEN 'attention' WHEN 5 THEN 'info'
      |    WHEN 6 THEN '42' WHEN 7 THEN 'warn' ELSE '' END AS sev
      |FROM events)
      |SELECT event_id, sev,
      |  CASE WHEN regexp_matches(trim(sev), '^[0-9]+$')
      |            THEN CAST(trim(sev) AS BIGINT)
      |       WHEN lower(trim(sev)) IN ('fatal', 'critical') THEN 9
      |       WHEN lower(trim(sev)) IN ('error', 'severe') THEN 6
      |       WHEN lower(trim(sev)) = 'attention' THEN 5
      |       WHEN lower(trim(sev)) = 'warning' THEN 3
      |       WHEN lower(trim(sev)) IN ('info', 'informational') THEN 1
      |       ELSE 0 END AS rank
      |FROM t
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        when(col("event_id") % 9 === 0, "FATAL")
          .when(col("event_id") % 9 === 1, " critical ")
          .when(col("event_id") % 9 === 2, "Severe")
          .when(col("event_id") % 9 === 3, "warning")
          .when(col("event_id") % 9 === 4, "attention")
          .when(col("event_id") % 9 === 5, "info")
          .when(col("event_id") % 9 === 6, "42")
          .when(col("event_id") % 9 === 7, "warn")
          .otherwise("").as("sev"))
      .withColumn("rank", Normalize.severityRank(col("sev")))
      .orderBy("event_id")
  }

  /** F20 — EWS `_normalize_problem_and_severity`: ""/"normal" → Ready,
    * sleep → Sleeping, both forcing informational; else pass-through
    * with no forced severity (ews_alerts.py:201-208). */
  val f20NormalizeProblem: QuerySpec = QuerySpec.sql(
    "f20_normalize_problem",
    """WITH t AS (SELECT doc_id,
      |  CASE doc_id % 4
      |    WHEN 0 THEN '' WHEN 1 THEN ' Normal '
      |    WHEN 2 THEN 'Deep Sleep mode' ELSE 'Paper jam' END AS label
      |FROM documents)
      |SELECT doc_id, label,
      |  CASE WHEN trim(label) = '' OR lower(trim(label)) = 'normal' THEN 'Ready'
      |       WHEN lower(trim(label)) LIKE '%sleep%' THEN 'Sleeping'
      |       ELSE trim(label) END AS problem,
      |  CASE WHEN trim(label) = '' OR lower(trim(label)) = 'normal'
      |            OR lower(trim(label)) LIKE '%sleep%' THEN 'informational'
      |       ELSE NULL END AS forced
      |FROM t
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val labeled = Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 0, "")
          .when(col("doc_id") % 4 === 1, " Normal ")
          .when(col("doc_id") % 4 === 2, "Deep Sleep mode")
          .otherwise("Paper jam").as("label"))
    val (np, forced) = EwsAlerts.normalizeProblem(col("label"))
    labeled.select(col("doc_id"), col("label"),
      np.as("problem"), forced.as("forced"))
      .orderBy("doc_id")
  }

  /** F23 — Brother label normalize + pretty: alpha-strip+upper, exact
    * color sets, unknown codes pass through unchanged
    * (brother_toner_web.py:10-25). */
  val f23LabelPretty: QuerySpec = QuerySpec.sql(
    "f23_label_pretty",
    """WITH t AS (SELECT p_partkey,
      |  CASE p_partkey % 7
      |    WHEN 0 THEN 'BK:' WHEN 1 THEN 'black!' WHEN 2 THEN ' Cyan '
      |    WHEN 3 THEN 'm' WHEN 4 THEN 'YELLOW ink' WHEN 5 THEN '123'
      |    ELSE 'Magenta' END AS raw
      |FROM part),
      |n AS (SELECT p_partkey, raw,
      |  nullif(upper(regexp_replace(raw, '[^A-Za-z]', '', 'g')), '') AS u
      |FROM t),
      |c AS (SELECT p_partkey, raw,
      |  CASE WHEN u IS NULL THEN NULL
      |       WHEN u IN ('BK', 'K', 'BLK', 'BLACK') THEN 'BK'
      |       WHEN u IN ('C', 'CYAN') THEN 'C'
      |       WHEN u IN ('M', 'MAGENTA') THEN 'M'
      |       WHEN u IN ('Y', 'YELLOW') THEN 'Y'
      |       ELSE u END AS code
      |FROM n)
      |SELECT p_partkey, raw, code,
      |  CASE code WHEN 'BK' THEN 'Black' WHEN 'C' THEN 'Cyan'
      |            WHEN 'M' THEN 'Magenta' WHEN 'Y' THEN 'Yellow'
      |            ELSE code END AS pretty
      |FROM c
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        when(col("p_partkey") % 7 === 0, "BK:")
          .when(col("p_partkey") % 7 === 1, "black!")
          .when(col("p_partkey") % 7 === 2, " Cyan ")
          .when(col("p_partkey") % 7 === 3, "m")
          .when(col("p_partkey") % 7 === 4, "YELLOW ink")
          .when(col("p_partkey") % 7 === 5, "123")
          .otherwise("Magenta").as("raw"))
      .select(col("p_partkey"), col("raw"),
        Normalize.labelNormalize(col("raw")).as("code"),
        Normalize.labelPretty(col("raw")).as("pretty"))
      .orderBy("p_partkey")
  }

  /** F8 — `_safe_int`: int(float(str(x).strip())) else null
    * (locations.py:11-17) — floats truncate toward zero, blanks and
    * non-numerics null out. TRUNC mirrors Python int()'s
    * toward-zero semantics (a bare DuckDB CAST would round). */
  val f8SafeInt: QuerySpec = QuerySpec.sql(
    "f8_safe_int",
    """WITH t AS (SELECT o_orderkey,
      |  CASE o_orderkey % 6
      |    WHEN 0 THEN CAST(o_orderkey AS VARCHAR)
      |    WHEN 1 THEN concat(' ', CAST(o_orderkey % 90 AS VARCHAR), '.75 ')
      |    WHEN 2 THEN ''
      |    WHEN 3 THEN NULL
      |    WHEN 4 THEN 'n/a'
      |    ELSE concat('-', CAST(o_orderkey % 50 AS VARCHAR), '.5') END AS raw
      |FROM orders)
      |SELECT o_orderkey, raw,
      |  CAST(TRUNC(TRY_CAST(raw AS DOUBLE)) AS BIGINT) AS safe_int
      |FROM t
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val k = col("o_orderkey")
    Tables.orders(s, d)
      .select(k,
        when(k % 6 === 0, k.cast("string"))
          .when(k % 6 === 1, concat(lit(" "), (k % 90).cast("string"), lit(".75 ")))
          .when(k % 6 === 2, lit(""))
          .when(k % 6 === 3, lit(null).cast("string"))
          .when(k % 6 === 4, lit("n/a"))
          .otherwise(concat(lit("-"), (k % 50).cast("string"), lit(".5")))
          .as("raw"))
      .withColumn("safe_int", Normalize.safeInt(col("raw")))
      .orderBy("o_orderkey")
  }

  val all: Seq[QuerySpec] = Seq(
    f6Sanitize, f8SafeInt, f10PctSymbol, f12ToText, f16CleanDesc,
    f18SeverityRank, f20NormalizeProblem, f23LabelPretty)
}

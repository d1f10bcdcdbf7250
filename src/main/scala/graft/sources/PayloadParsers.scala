package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Normalize

/** Raw-payload parsers for the remaining device-scan sources
  * (SURVEY.md §2.1 S8/S9/S11, §2.6 F23/F26/F27). The network fetch is
  * DevicePoll's seam; these transform captured payload columns into
  * relational rows with pure built-ins — xpath for XML, regex for the
  * fixed Brother HTML layout, from_json over both catalog shapes. All
  * scan-local, codegen-friendly, zero shuffle. */
object PayloadParsers {

  // ---- S8/F27: LEDM XML (adapters/ledm_client.py:19-44,96-170) ----

  /** Namespace-insensitive first non-blank text among candidate tag
    * names in DOCUMENT order — `_text_of_first` (ledm_client.py:35-44)
    * scans the tree once and takes the first element matching ANY
    * candidate, not the first candidate that answers anywhere. Pure
    * built-ins (one union xpath); for the exact ElementTree `.text`
    * semantics use `xml_first_local_text` (graft.plans). */
  def xmlLocalText(xml: Column, tagNames: Seq[String]): Column = {
    val pred = tagNames.map(t => s"local-name()='$t'").mkString(" or ")
    val texts = xpath(xml, lit(s"//*[$pred]/text()"))
    trim(get(filter(texts, s => length(trim(s)) > 0), lit(0)))
  }

  private def registerXmlFns(payloads: DataFrame): Unit =
    graft.plans.GraftExtensions.register(payloads.sparkSession)

  /** `problem_from_status` (ledm_client.py:111-128): first non-blank
    * among LocString/StatusString/StatusMessage/Reason/DetailedReason/
    * State; else the lowercased StatusCategory through the fixed
    * mapping (unknown categories capitalize); null when neither. */
  def ledmProblemFromStatus(xml: Column): Column = {
    val s = call_function("xml_first_local_text", xml,
      lit("LocString,StatusString,StatusMessage,Reason,DetailedReason,State"))
    val cat = lower(coalesce(
      call_function("xml_first_local_text", xml, lit("StatusCategory")), lit("")))
    val mapped = when(cat === "ready", "Ready")
      .when(cat === "processing", "Processing")
      .when(cat === "warmup", "Warming up")
      .when(cat === "attention", "Needs attention")
      .when(cat === "interventionrequired", "Needs attention")
      .when(cat === "error", "Error")
      .when(cat === "idle", "Idle")
      .when(cat === "sleep", "Sleep")
      // str.capitalize(): first char upper, rest already lower
      .otherwise(concat(upper(substring(cat, 1, 1)), substring(cat, 2, 1 << 30)))
    coalesce(s, when(cat =!= "", mapped))
  }

  /** EventTable.xml → one row per Event element with the reference's
    * candidate tag lists (ledm_client.py:96-109): Severity, then
    * Code/EventCode/ID/ErrorCode and Description/EventDescription/
    * Name/Reason, each `_text_of_first` within the Event subtree. */
  def ledmEvents(payloads: DataFrame, keyCol: String, xmlCol: String = "xml"): DataFrame = {
    registerXmlFns(payloads)
    payloads.selectExpr(s"`$keyCol`",
      s"""xml_local_records(`$xmlCol`, 'Event', 'Severity',
         |'Code,EventCode,ID,ErrorCode',
         |'Description,EventDescription,Name,Reason')
         |AS (event_idx, severity, code, description)""".stripMargin)
  }

  /** ProductStatusDyn.xml Alert elements (ledm_client.py:130-147):
    * severity defaults to "Info", code candidates include the
    * HP-specific ProductStatusAlertID/StringId. */
  def ledmAlerts(payloads: DataFrame, keyCol: String, xmlCol: String = "xml"): DataFrame = {
    registerXmlFns(payloads)
    payloads.selectExpr(s"`$keyCol`",
      s"""xml_local_records(`$xmlCol`, 'Alert', 'Severity',
         |'ProductStatusAlertID,StringId,ID,Code',
         |'AlertDetailsUserAction,Description,Name,Reason')
         |AS (alert_idx, severity, code, description)""".stripMargin)
  }

  /** `best_event_from_table` election (ledm_client.py:96-109): rank by
    * SEVERITY_ORDER (default −1), `>=` keeps the LAST max — a max over
    * (rank, idx) since idx is unique. Emits one row per key with
    * (ev_code, ev_problem, ev_severity = LEDM triage of the winner's
    * raw severity). Keys with no events emit nothing (None tuple). */
  def ledmBestEvents(events: DataFrame, keyCol: String): DataFrame =
    bestByRank(events, keyCol, "event_idx", defaultRank = -1,
      sevForRank = upper(coalesce(col("severity"), lit(""))), prefix = "ev")

  /** `_best_alert_from_status` election (ledm_client.py:130-147): same
    * shape, severity defaults "Info", rank default 0. */
  def ledmBestAlerts(alerts: DataFrame, keyCol: String): DataFrame =
    bestByRank(alerts, keyCol, "alert_idx", defaultRank = 0,
      sevForRank = upper(coalesce(col("severity"), lit("Info"))), prefix = "al")

  private def bestByRank(rows: DataFrame, keyCol: String, idxCol: String,
      defaultRank: Int, sevForRank: Column, prefix: String): DataFrame = {
    val rank = coalesce(
      element_at(typedLit(Normalize.LedmSeverityOrder), sevForRank),
      lit(defaultRank))
    rows
      .groupBy(col(keyCol))
      .agg(max(struct(rank.as("rank"), col(idxCol).as("idx"),
        col("code"), col("description"), sevForRank.as("sev_raw"))).as("best"))
      .select(col(keyCol),
        col("best.code").as(s"${prefix}_code"),
        col("best.description").as(s"${prefix}_problem"),
        Normalize.triageLedm(col("best.sev_raw")).as(s"${prefix}_severity"))
  }

  /** `normalize_problem_and_severity` (ledm_client.py:159-170):
    * SUBSTRING-based chain — unknown → (null, informational);
    * acknowledgeconsumablestate → Ready; ready-not-"not ready"/
    * "unready" or מוכן → Ready; sleep / inpowersave / שינה → Sleeping. */
  def normalizeProblemSeverity(problem: Column, severity: Column): (Column, Column) = {
    val p = trim(coalesce(problem, lit("")))
    val low = lower(p)
    val isUnknown = low.contains("unknown")
    val isAck = low.contains("acknowledgeconsumablestate")
    val isReady = (low.contains("ready") && !low.contains("not ready") &&
      !low.contains("unready")) || p.contains("מוכן")
    val isSleep = low.contains("sleep") || low.contains("inpowersave") ||
      p.contains("שינה")
    val np = when(isUnknown, lit(null).cast(StringType))
      .when(isAck || isReady, "Ready")
      .when(isSleep, "Sleeping")
      .otherwise(problem)
    val ns = when(isUnknown || isAck || isReady || isSleep, "informational")
      .otherwise(severity)
    (np, ns)
  }

  /** `get_ledm_problem_and_severity` (ledm_client.py:172-184): event
    * election wins, then status-doc alert election, then
    * problem_from_status, then "Unknown"; severity = event → alert →
    * derived-from-problem; normalize; blank-fill Normal/informational.
    * Event and alert severities take precedence over text-derived. */
  def ledmProblemSeverity(payloads: DataFrame, keyCol: String,
      statusCol: String = "status_xml", eventsCol: String = "events_xml"): DataFrame = {
    val ev = ledmBestEvents(
      ledmEvents(payloads.select(col(keyCol), col(eventsCol)), keyCol, eventsCol), keyCol)
    val al = ledmBestAlerts(
      ledmAlerts(payloads.select(col(keyCol), col(statusCol)), keyCol, statusCol), keyCol)
    val joined = payloads
      .withColumn("st_problem", ledmProblemFromStatus(col(statusCol)))
      .join(ev, Seq(keyCol), "left")
      .join(al, Seq(keyCol), "left")
    // Python `or` chain: empty strings are falsy, but the election and
    // st_problem already null out blanks.
    val problem0 = coalesce(col("ev_problem"), col("al_problem"),
      col("st_problem"), lit("Unknown"))
    val severity0 = coalesce(col("ev_severity"), col("al_severity"),
      Normalize.severityFromProblem(problem0))
    val (np, ns) = normalizeProblemSeverity(problem0, severity0)
    joined
      .withColumn("problem", coalesce(when(length(np) > 0, np), lit("Normal")))
      .withColumn("severity", coalesce(when(length(ns) > 0, ns), lit("informational")))
  }

  /** Status-doc-only convenience (no EventTable payload): alerts +
    * problem_from_status through the same chain. */
  def ledmStatus(payloads: DataFrame, keyCol: String, xmlCol: String = "xml"): DataFrame = {
    val al = ledmBestAlerts(
      ledmAlerts(payloads.select(col(keyCol), col(xmlCol)), keyCol, xmlCol), keyCol)
    val joined = payloads
      .withColumn("st_problem", ledmProblemFromStatus(col(xmlCol)))
      .join(al, Seq(keyCol), "left")
    val problem0 = coalesce(col("al_problem"), col("st_problem"), lit("Unknown"))
    val severity0 = coalesce(col("al_severity"),
      Normalize.severityFromProblem(problem0))
    val (np, ns) = normalizeProblemSeverity(problem0, severity0)
    joined
      .withColumn("problem", coalesce(when(length(np) > 0, np), lit("Normal")))
      .withColumn("severity", coalesce(when(length(ns) > 0, ns), lit("informational")))
  }

  // ---- S9/F23/F26: Brother ink-level HTML (brother_toner_web.py:38-95) ----

  /** Fixed-layout scrape: bar-image heights (levels) + labels, zipped
    * positionally; percent = height clamped to [0,100] (the page's bars
    * are 0–100 px); labels normalized BK/C/M/Y → pretty colors. */
  def brotherInkLevels(payloads: DataFrame, keyCol: String,
      htmlCol: String = "html"): DataFrame = {
    val heights = regexp_extract_all(col(htmlCol),
      lit("height\\s*[:=]\\s*\"?(\\d+)"), lit(1))
    val labels = regexp_extract_all(col(htmlCol),
      lit("alt=\"([A-Za-z]+)\""), lit(1))
    payloads
      .select(col(keyCol),
        posexplode_outer(arrays_zip(heights, labels)).as(Seq("bar_idx", "z")))
      .select(col(keyCol), col("bar_idx"),
        Normalize.labelPretty(col("z.1")).as("cartridge"),
        Normalize.pctWithSymbol(
          greatest(least(col("z.0").try_cast("long"), lit(100L)), lit(0L)))
          .as("remaining_percent"))
  }

  // ---- S11: code catalog, dict-or-list shapes (ews_alerts.py:118-142) ----

  private val ItemSchema = ArrayType(StructType(Seq(
    StructField("code", StringType), StructField("status", StringType),
    StructField("info", StringType))))

  /** Accepts BOTH catalog shapes — a list of {code,status,info} items or
    * a {code: {status,info}} map — and lands a uniform (code, status,
    * info) table ready to broadcast into J6. */
  def codeCatalog(raw: DataFrame, jsonCol: String = "json"): DataFrame = {
    val t = trim(col(jsonCol))
    val listRows = raw.where(t.startsWith("["))
      .select(explode(from_json(t, ItemSchema)).as("e"))
      .select(col("e.code"), col("e.status"), col("e.info"))
    val mapRows = raw.where(t.startsWith("{"))
      .select(explode(from_json(t,
        MapType(StringType, StructType(Seq(
          StructField("status", StringType), StructField("info", StringType))))))
        .as(Seq("code", "v")))
      .select(col("code"), col("v.status"), col("v.info"))
    listRows.unionByName(mapRows)
      .where(col("code").isNotNull && trim(col("code")) =!= "")
  }
}

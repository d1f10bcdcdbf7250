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

  // ---- S8/F27: LEDM XML (adapters/ledm_client.py:19-44,66-94) ----

  /** Namespace-insensitive first-non-empty text among candidate tag
    * names — `_find_text` (ledm_client.py:19-44): xpath local-name()
    * query per candidate, coalesce in candidate order. */
  def xmlLocalText(xml: Column, tagNames: Seq[String]): Column =
    coalesce(tagNames.map { t =>
      val x = xpath_string(xml, lit(s"//*[local-name()='$t']"))
      when(length(trim(x)) > 0, trim(x))
    } :+ lit(null).cast(StringType): _*)

  /** ProductStatusDyn.xml → (status, problem, severity): status from
    * the first candidate tag that answers; problem normalized; severity
    * derived from the problem text (F20/F21, ledm_client.py:96-170). */
  def ledmStatus(payloads: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val status = xmlLocalText(col(xmlCol), Seq("Status", "StatusCategory", "State"))
    val problem0 = xmlLocalText(col(xmlCol), Seq("Problem", "AlertDetails", "Summary"))
    // F20 problem normalization: ready/sleep variants, Hebrew aliases.
    val p = Normalize.norm(coalesce(problem0, status, lit("")))
    val problem =
      when(p === "" || p === "normal" || p === "ready" || p === "מוכן", "Ready")
        .when(p.contains("sleep") || p === "שינה", "Sleeping")
        .when(p === "unknown", lit(null).cast(StringType))
        .otherwise(initcap(p))
    payloads.withColumn("status", status)
      .withColumn("problem", problem)
      .withColumn("severity",
        when(col("problem").isin("Ready", "Sleeping"), "informational")
          .otherwise(Normalize.severityFromProblem(col("problem"))))
  }

  /** EventTable.xml → one row per event via the xpath array form, with
    * per-row severity triage — the A3 argmax runs downstream. */
  def ledmEvents(payloads: DataFrame, keyCol: String, xmlCol: String = "xml"): DataFrame =
    payloads
      .select(col(keyCol),
        posexplode_outer(xpath(col(xmlCol),
          lit("//*[local-name()='Event']//*[local-name()='EventCategory']/text()")))
          .as(Seq("event_idx", "category")))
      .withColumn("severity", Normalize.triage(col("category")))

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

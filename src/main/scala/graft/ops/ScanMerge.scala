package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.DocumentIngest

/** The tonerFinder merge rule (plugins/tonerFinder/toner_hp.py:75-93,
  * same shape in toner_brother.py): SELECTED printers (good IP + model
  * match) get `printerInfo.status/cartridges` written from the scan —
  * a device whose scan produced nothing degrades to ("offline", [])
  * like the reference's per-printer except-branch — while UNSELECTED
  * printers are untouched (their printerInfo stays null if it was
  * null: `ensure_printer_info` only runs on selected records).
  *
  * Scale: one equi-join keyed by device IP; both sides are fleet-sized
  * and pre-partitioned by the same key, so AQE plans a local join after
  * the poll's mapPartitions stage. */
object ScanMerge {

  private def piBaseOf(printers: DataFrame): Column = {
    val piType = printers.schema("printerInfo").dataType.asInstanceOf[StructType]
    coalesce(col("printerInfo"),
      struct(piType.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)): _*))
  }

  /** Shared write-back skeleton: join scan results to SELECTED printers
    * by normalized IP, then rewrite printerInfo via `hit` (a scan row
    * answered) or `miss` (selected but nothing came back — the
    * reference's per-printer except-branch). Unselected rows keep their
    * printerInfo verbatim. */
  private def writeBack(printers: DataFrame, r: DataFrame, selected: Column)(
      hit: Column => Column, miss: Column => Column): DataFrame = {
    val piBase = piBaseOf(printers)
    val scanCols = r.columns.toSeq
    printers
      .withColumn("__sel", selected)
      .withColumn("__ip", DocumentIngest.ipOf(printers))
      .join(r, col("__ip") === col("scan_ip") && col("__sel"), "left")
      .withColumn("printerInfo",
        when(!col("__sel") || col("__sel").isNull, col("printerInfo"))
          .when(col("scan_ip").isNotNull, hit(piBase))
          .otherwise(miss(piBase)))
      .drop(Seq("__sel", "__ip") ++ scanCols: _*)
  }

  /** @param printers unified printers frame (printerInfo struct column)
    * @param results  scan output `(ip, status, cartridges)`
    * @param selected the plugin's selection predicate over `printers`
    *                 (e.g. valid IP ∧ model set; NOTE the reference's
    *                 --only-ip mode selects by IP equality ALONE — no
    *                 type screen — so pass only the ip predicate there) */
  def apply(printers: DataFrame, results: DataFrame, selected: Column): DataFrame = {
    val piType = printers.schema("printerInfo").dataType.asInstanceOf[StructType]
    val cartsType = piType("cartridges").dataType
    val r = results.select(col("ip").as("scan_ip"),
      col("status").as("scan_status"), col("cartridges").as("scan_carts"))
    writeBack(printers, r, selected)(
      hit = _.withField("status", col("scan_status"))
        .withField("cartridges", col("scan_carts").cast(cartsType)),
      miss = _.withField("status", lit("offline"))
        .withField("cartridges", array().cast(cartsType)))
  }

  /** The printerError merge rule (plugins/printerError/
    * snmp_active_alerts.py:43-82, identical in ews/ledm variants):
    * selected printers get `printerInfo.printerError = {problem,
    * severity}` from the alert poll; a selected device that yielded
    * nothing takes this family's DISTINCT except-branch default
    * {"Offline", "critical"} — not the tonerFinder ("offline", [])
    * pair. The struct replaces any previous printerError wholesale
    * (`info["printerError"] = {...}`). */
  def alerts(printers: DataFrame, results: DataFrame, selected: Column): DataFrame = {
    def pe(p: Column, s: Column): Column =
      struct(p.as("problem"), s.as("severity"))
    val r = results.select(col("ip").as("scan_ip"),
      col("problem").as("scan_problem"), col("severity").as("scan_severity"))
    writeBack(printers, r, selected)(
      hit = _.withField("printerError",
        pe(col("scan_problem"), col("scan_severity"))),
      miss = _.withField("printerError", pe(lit("Offline"), lit("critical"))))
  }
}

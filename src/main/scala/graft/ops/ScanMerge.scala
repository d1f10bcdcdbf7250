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

  /** @param printers unified printers frame (printerInfo struct column)
    * @param results  scan output `(ip, status, cartridges)`
    * @param selected the plugin's selection predicate over `printers`
    *                 (e.g. valid IP ∧ model set) */
  def apply(printers: DataFrame, results: DataFrame, selected: Column): DataFrame = {
    val piType = printers.schema("printerInfo").dataType.asInstanceOf[StructType]
    val cartsType = piType("cartridges").dataType
    val piBase = coalesce(col("printerInfo"),
      struct(piType.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)): _*))
    val r = results.select(col("ip").as("scan_ip"),
      col("status").as("scan_status"), col("cartridges").as("scan_carts"))
    val joined = printers
      .withColumn("__sel", selected)
      .withColumn("__ip", DocumentIngest.ipOf(printers))
      .join(r, col("__ip") === col("scan_ip") && col("__sel"), "left")
    joined
      .withColumn("printerInfo",
        when(!col("__sel") || col("__sel").isNull, col("printerInfo"))
          .when(col("scan_ip").isNotNull, piBase
            .withField("status", col("scan_status"))
            .withField("cartridges", col("scan_carts").cast(cartsType)))
          .otherwise(piBase
            .withField("status", lit("offline"))
            .withField("cartridges", array().cast(cartsType))))
      .drop("__sel", "__ip", "scan_ip", "scan_status", "scan_carts")
  }
}

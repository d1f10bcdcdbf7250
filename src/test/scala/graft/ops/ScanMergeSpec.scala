package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.DocumentIngest

class ScanMergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val printers = DocumentIngest.printersUnified(
    DocumentIngest.readDocument(spark,
      getClass.getResource("/printers.json").getPath))

  test("selected+scanned written; selected+missing degrades; unselected untouched") {
    val results = Seq(
      ("10.0.1.7", "online", Seq(("Black", "41%")))) // only one device answered
      .toDF("ip", "status", "carts")
      .select(col("ip"), col("status"),
        expr("transform(carts, c -> named_struct('cartridge', c._1, 'remaining_percent', c._2))")
          .as("cartridges"))
    // select: valid IP and HP models only (the toner_hp shape)
    val selected = lower(trim(coalesce(col("Type"), lit(""))))
      .isin("m404dn", "m426fdw") &&
      DocumentIngest.ipOf(printers).isNotNull &&
      !lower(DocumentIngest.ipOf(printers)).isin(DocumentIngest.BadIps: _*)

    val out = ScanMerge(printers, results, selected)
    val byIdx = out
      .select(col("group"), col("row_idx"),
        col("printerInfo.status").as("st"),
        size(col("printerInfo.cartridges")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue) -> (r.getString(2), r.getInt(3)))
      .toMap

    // ID 3 @10.0.1.7 (M404dn): scanned → written
    assert(byIdx(("Company_Grouped", 0L)) == ("online", 1))
    // ID "7.0" (M426fdw) has a bad IP "-": UNSELECTED → original kept
    assert(byIdx(("Company_Grouped", 1L)) == ("sleep mode", 2))
    // ID " 7\n" @10.0.3.9 (M404dn): selected, no scan row → offline, []
    assert(byIdx(("Company_Grouped", 2L)) == ("offline", 0))
  }

  test("alerts merge: printerError family defaults to {Offline, critical}") {
    // the printerError plugins' except-branch default differs from the
    // tonerFinder one (snmp_active_alerts.py:56-58 vs toner_hp.py:66-69)
    val results = Seq(("10.0.1.7", "Paper jam", "critical"))
      .toDF("ip", "problem", "severity")
    val selected = lower(trim(coalesce(col("Type"), lit(""))))
      .isin("m404dn", "m426fdw") &&
      DocumentIngest.ipOf(printers).isNotNull &&
      !lower(DocumentIngest.ipOf(printers)).isin(DocumentIngest.BadIps: _*)

    val out = ScanMerge.alerts(printers, results, selected)
    val byIdx = out
      .select(col("group"), col("row_idx"),
        col("printerInfo.printerError.problem").as("p"),
        col("printerInfo.printerError.severity").as("sv"),
        col("printerInfo.status").as("st"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue) ->
        (r.getString(2), r.getString(3), r.getString(4)))
      .toMap

    // scanned: alert written; pre-existing status untouched by this rule
    assert(byIdx(("Company_Grouped", 0L))._1 == "Paper jam")
    assert(byIdx(("Company_Grouped", 0L))._2 == "critical")
    // unselected (bad IP): whatever was there stays
    assert(byIdx(("Company_Grouped", 1L))._3 == "sleep mode")
    // selected, no scan row → the alert-family failure default
    assert(byIdx(("Company_Grouped", 2L))._1 == "Offline")
    assert(byIdx(("Company_Grouped", 2L))._2 == "critical")
  }
}

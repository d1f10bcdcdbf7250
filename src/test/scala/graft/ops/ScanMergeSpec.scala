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

  test("tonerType merge: group probe backfills every member, creates printerInfo") {
    // snmp family over the fixture: the M404dn group's first member
    // (doc order) holds ["W1470A"] → probe wins, no scan needed, and
    // the preset backfills ALL members — including Branches 330 which
    // has no printerInfo at all (ensure_printer_info)
    val results = Seq.empty[(String, Seq[String])].toDF("ip", "codes")
    val ipN = DocumentIngest.ipOf(printers)
    val selected = lower(trim(coalesce(col("Type"), lit(""))))
      .isin("m404dn", "mfc-l9570cdw") &&
      ipN.isNotNull && !lower(ipN).isin(DocumentIngest.BadIps: _*)

    val out = ScanMerge.tonerType(printers, results, selected, web = false)
    val byIdx = out
      .select(col("group"), col("row_idx"),
        col("printerInfo.tonerType").as("tt"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue) ->
        Option(r.getSeq[String](2)).map(_.toList))
      .toMap

    // M404dn group: probe = first member's ["W1470A"], backfilled to all
    assert(byIdx(("Company_Grouped", 0L)) == Some(List("W1470A")))
    assert(byIdx(("Company_Grouped", 2L)) == Some(List("W1470A")))
    // Branches 330 (M404dn, good ip, NO printerInfo): gains the struct
    assert(byIdx(("Branches_Grouped", 2L)) == Some(List("W1470A")))
    // MFC-L9570CDW group: the web-written scalar unified at ingest to
    // ["MLT-D203E"] counts as a non-empty list for the snmp probe
    assert(byIdx(("Branches_Grouped", 0L)) == Some(List("MLT-D203E")))
    // unselected (bad IPs): untouched
    assert(byIdx(("Company_Grouped", 1L)) == Some(List("CF226X", "CF226X")))
    assert(byIdx(("Branches_Grouped", 1L)).isEmpty) // null stays null
  }

  test("tonerType merge: scan path, web scalar unify-at-merge, family empty defaults") {
    // synthetic frame: no usable presets, so the representative scan
    // decides; exercises the web-vs-snmp probe guard on [""] and both
    // families' empty defaults
    val p2 = Seq(
      ("Company_Grouped", 0L, "408dn", "10.9.0.1", null.asInstanceOf[String]),
      ("Company_Grouped", 1L, "408dn", "10.9.0.2", null.asInstanceOf[String]),
      ("Company_Grouped", 2L, "MFP432", "10.9.0.3", ""),
      ("Company_Grouped", 3L, "E60055", "10.9.0.4", null.asInstanceOf[String]),
      ("Branches_Grouped", 0L, "408dn", "-", "S1"))
      .toDF("group", "row_idx", "Type", "Printer IP", "tt0")
      .withColumn("printerInfo",
        when(col("tt0").isNotNull, struct(lit("x").as("status"),
          DocumentIngest.unifyTonerType(col("tt0")).as("tonerType"))))
      .drop("tt0")
    val ipN = DocumentIngest.ipOf(p2)
    val selected = ipN.isNotNull && !lower(ipN).isin(DocumentIngest.BadIps: _*)

    def ttOf(out: org.apache.spark.sql.DataFrame) = out
      .select(col("group"), col("row_idx"), col("printerInfo.tonerType").as("tt"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue) ->
        Option(r.getSeq[String](2)).map(_.toList))
      .toMap

    // web: scalar scan result wraps to a 1-element array at merge;
    // [""] is not a probe (empty string); scan-less group → [""]
    val web = ttOf(ScanMerge.tonerType(p2,
      Seq(("10.9.0.1", "TID42")).toDF("ip", "tid"),
      selected && lower(trim(col("Type"))).isin("408dn", "mfp432"), web = true))
    assert(web(("Company_Grouped", 0L)) == Some(List("TID42")))
    assert(web(("Company_Grouped", 1L)) == Some(List("TID42"))) // backfill
    assert(web(("Company_Grouped", 2L)) == Some(List(""))) // no probe, no scan → ""
    assert(web(("Company_Grouped", 3L)).isEmpty) // unselected type: untouched
    assert(web(("Branches_Grouped", 0L)) == Some(List("S1"))) // bad ip: untouched

    // snmp on the same frame: [""] IS a non-empty list → probe wins for
    // MFP432; the scan-less E60055 group takes the snmp empty [] —
    // and the scanned 408dn group takes the array result as-is
    val snmp = ttOf(ScanMerge.tonerType(p2,
      Seq(("10.9.0.1", Seq("C1", "C2"))).toDF("ip", "codes"),
      selected && lower(trim(col("Type"))).isin("408dn", "mfp432", "e60055"),
      web = false))
    assert(snmp(("Company_Grouped", 0L)) == Some(List("C1", "C2")))
    assert(snmp(("Company_Grouped", 1L)) == Some(List("C1", "C2")))
    assert(snmp(("Company_Grouped", 2L)) == Some(List("")))
    assert(snmp(("Company_Grouped", 3L)) == Some(Nil)) // snmp empty default []
    assert(snmp(("Branches_Grouped", 0L)) == Some(List("S1")))
  }

  test("duplicate scan-result IPs never fan out the fleet") {
    // an appended retry row for the same device: the reference calls
    // each device once (dict semantics) — the merge must keep one row
    // per ip and one output row per printer
    val results = Seq(
      ("10.0.1.7", "online", Seq(("Black", "41%"))),
      ("10.0.1.7", "retry-won", Seq(("Black", "40%"), ("Cyan", "9%"))))
      .toDF("ip", "status", "carts")
      .select(col("ip"), col("status"),
        expr("transform(carts, c -> named_struct('cartridge', c._1, 'remaining_percent', c._2))")
          .as("cartridges"))
    val selected = lower(trim(coalesce(col("Type"), lit(""))))
      .isin("m404dn", "m426fdw") &&
      DocumentIngest.ipOf(printers).isNotNull &&
      !lower(DocumentIngest.ipOf(printers)).isin(DocumentIngest.BadIps: _*)
    val out = ScanMerge(printers, results, selected)
    assert(out.count() == printers.count()) // no duplication
    // deterministic pick (min over the value struct): "online" < "retry-won"
    val hit = out.filter(col("group") === "Company_Grouped" && col("row_idx") === 0)
      .select(col("printerInfo.status")).collect().head.getString(0)
    assert(hit == "online")

    // with a row-order column the RETRY row wins — the reference's
    // dict-overwrite last-appended semantics, even though "retry-won"
    // sorts after "online" (so struct-min would have picked the other)
    val ordered = results.withColumn("scan_seq",
      monotonically_increasing_id())
    val out2 = ScanMerge(printers, ordered, selected,
      orderCol = Some("scan_seq"))
    assert(out2.count() == printers.count())
    val hit2 = out2.filter(col("group") === "Company_Grouped" && col("row_idx") === 0)
      .select(col("printerInfo.status")).collect().head.getString(0)
    assert(hit2 == "retry-won")
    // the order column must not leak into the merged output
    assert(!out2.columns.contains("scan_seq"))

    // null order stamps must not corrupt: an unstamped row LOSES to any
    // stamped one...
    val mixed = results.withColumn("scan_seq",
      when(col("status") === "retry-won", lit(null).cast("long"))
        .otherwise(lit(5L)))
    val hit3 = ScanMerge(printers, mixed, selected, Some("scan_seq"))
      .filter(col("group") === "Company_Grouped" && col("row_idx") === 0)
      .select(col("printerInfo.status")).collect().head.getString(0)
    assert(hit3 == "online")
    // ...and a key whose rows are ALL unstamped still resolves to a real
    // row (value-struct tie-break), never a null scan struct — a bare
    // max_by over the stamp would have dropped every row here
    val allNull = results.withColumn("scan_seq", lit(null).cast("long"))
    val hit4 = ScanMerge(printers, allNull, selected, Some("scan_seq"))
      .filter(col("group") === "Company_Grouped" && col("row_idx") === 0)
      .select(col("printerInfo.status")).collect().head.getString(0)
    assert(hit4 == "retry-won") // deterministic: max over the value struct
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

package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.FleetSnapshot

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docPath =
    getClass.getResource("/printers.json").getPath
  private lazy val doc = DocumentIngest.readDocument(spark, docPath)

  test("P1/U1: explode both groups with discriminator + row index") {
    val p = DocumentIngest.printers(doc)
    assert(p.count() == 6)
    val byGroup = p.groupBy("group").count().as[(String, Long)].collect().toMap
    assert(byGroup == Map("Company_Grouped" -> 3L, "Branches_Grouped" -> 3L))
    // union-by-name keeps group-specific columns, null on the other side
    assert(p.columns.contains("Floor") && p.columns.contains("Name"))
    assert(p.where($"group" === "Company_Grouped" && $"Name".isNotNull).count() == 0)
    // positional index preserved per group
    assert(p.where($"group" === "Company_Grouped").select(max("row_idx"))
      .first().getInt(0) == 2)
  }

  test("tonerType dual-type unification: array stays, scalar wraps, null stays") {
    val p = DocumentIngest.printersUnified(doc)
    val tt = p.select($"ID".cast("string"), $"printerInfo.tonerType")
      .as[(String, Option[Seq[String]])].collect().toMap
    assert(tt("3") == Some(Seq("W1470A")))
    assert(tt("105") == Some(Seq("MLT-D203E"))) // web-path scalar wrapped
    assert(tt("212") == None)
    assert(tt("330") == None) // no printerInfo at all
  }

  test("P3: bad-IP filter keeps only real IPs, before any fan-out") {
    val p = DocumentIngest.withValidIp(DocumentIngest.printers(doc))
    val ips = p.select("ip").as[String].collect().toSet
    assert(ips == Set("10.0.1.7", "10.0.3.9", "10.5.0.12", "10.7.0.3"))
  }

  test("S3: employee header synonyms (EN+Hebrew), blank rows dropped") {
    // "מספר סניף" is in the reference's exact id synonym list
    // (employee_source.py:24); "מס' סניף" is NOT and would null out.
    val raw = Seq(
      ("105", "דנה לוי", "0540000000"),
      ("212", "", "0521111111"),
      ("", "", ""))
      .toDF("מספר סניף", "שם איש קשר", "Contacts Phone")
    val e = SideTables.employees(raw).orderBy("id")
    val rows = e.as[(String, String, String)].collect()
      .map { case (i, n, p) => (i, Option(n), Option(p)) }
    assert(e.columns.toSeq == Seq("id", "name", "phone"))
    assert(rows.toSeq == Seq(
      ("105", Some("דנה לוי"), Some("0540000000")),
      ("212", None, Some("0521111111"))))
  }

  test("S4: duplicate headers deduped positionally, unnamed dropped") {
    val df = Seq(("a", "b", "c", "d")).toDF("X", "x", "Unnamed: 3", "X")
    val out = SideTables.dedupeHeaders(df)
    // duplicates count by EXACT trimmed name (location_source.py:6-21):
    // "x" is a distinct base from "X" (suffixed only because Spark's
    // case-insensitive resolution cannot hold both), the second "X"
    // becomes X_2.
    assert(out.columns.toSeq == Seq("X", "x__1", "X_2"))
  }

  test("S5: device fan-out degrades per-device failure to zero rows") {
    val client = new DeterministicSnmpFake(failEvery = 2) // even hashes fail
    val devices = Seq("a", "b", "c", "d", "e").toDF("ip")
    val walk = DevicePoll.walk(spark, devices, SnmpPayload.SuppliesBase,
      client, parallelism = 3)
    val polled = walk.select("ip").distinct().as[String].collect().toSet
    val expected = Seq("a", "b", "c", "d", "e")
      .filter(ip => math.abs(ip.hashCode) % 2 != 0).toSet
    assert(polled == expected)
    assert(polled.nonEmpty)
  }

  test("A1/J4/F9-F11: SNMP walk rows → ordered cartridge structs") {
    val client = new DeterministicSnmpFake(failEvery = 0)
    val devices = Seq("10.0.1.7").toDF("ip")
    val supplies = DevicePoll.walk(spark, devices, SnmpPayload.SuppliesBase, client, 1)
    val colorant = DevicePoll.walk(spark, devices, SnmpPayload.ColorantBase, client, 1)
    val out = SnmpPayload.cartridges(supplies.union(colorant))
      .as[(String, Seq[(String, String)])].collect()
    assert(out.length == 1)
    val (ip, carts) = out.head
    assert(ip == "10.0.1.7")
    val h = math.abs("10.0.1.7".hashCode)
    assert(carts.length == 1 + h % 4)
    // colors follow the colorant table in SNMP row order
    val wantColors = Seq("Black", "Cyan", "Magenta", "Yellow").take(carts.length)
    assert(carts.map(_._1) == wantColors)
    // every percent is null or "N%" with N in [0,100]
    carts.map(_._2).filter(_ != null).foreach { p =>
      assert(p.matches("\\d+%"))
      assert(p.dropRight(1).toInt >= 0 && p.dropRight(1).toInt <= 100)
    }
  }

  test("FleetSnapshot: flatten + first-wins colors + raw nulls") {
    val snap = FleetSnapshot(DocumentIngest.printersUnified(doc))
    val byId = snap.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("3").getAs[String]("Status") == "online")
    // float("37%") fails in the reference, so the formatted string is
    // kept VERBATIM (update_from_json.py:96-103)
    assert(byId("3").getAs[String]("Black") == "37%")
    assert(byId("3").getAs[String]("Toner Type") == "W1470A")
    // first-wins: "black toner" (5%) precedes "K" (99%)
    assert(byId.keySet.contains("7"))
    val seven = snap.where(col("row_idx") === 1 && col("group") === "Company_Grouped")
      .collect().head
    assert(seven.getAs[String]("Black") == "5%")
    assert(seven.getAs[String]("Toner Type") == "CF226X") // distinct
    // null percent → null; dashing happens at the SHEET write, so the
    // snapshot keeps raw nulls (extract_info leaves None)
    assert(byId("212").isNullAt(byId("212").fieldIndex("Yellow")))
    assert(byId("330").getAs[String]("Status") == "offline")
    assert(byId("330").isNullAt(byId("330").fieldIndex("Error")))
  }

  test("J3: cross-group id collision — the later GROUP wins, not the larger row_idx") {
    // document order is (group rank, row_idx): a Branches record at
    // row_idx 2 must beat a Company record at row_idx 900 for the same
    // canonical id (iter_printers walks Company_Grouped first)
    import spark.implicits._
    val snap = Seq(
      ("Company_Grouped", 900L, "55", "company-wins?"),
      ("Branches_Grouped", 2L, "55", "branches-wins"))
      .toDF("group", "row_idx", "id", "Status")
    val idMap = FleetSnapshot.upsertIdMap(snap)
    assert(idMap.count() == 1)
    assert(idMap.collect().head.getAs[String]("Status") == "branches-wins")
  }

  test("J3: last-wins id map + sheet update only touches matching rows") {
    val snap = FleetSnapshot(DocumentIngest.printersUnified(doc))
    val idMap = FleetSnapshot.upsertIdMap(snap)
    // duplicate canonical id 7 ("7.0" row_idx=1, " 7\n" row_idx=2): later wins
    val seven = idMap.where(col("id") === "7").collect().head
    assert(seven.getAs[String]("Status") == "offline")
    assert(seven.getAs[String]("Severity") == "critical")

    val sheet = Seq(
      ("7.0", "keep", "x"), ("999", "keep", "y"))
      .toDF("ID", "Comment", "Status")
    val updated = FleetSnapshot.updateSheet(sheet, idMap)
    val rows = updated.collect().map(r => r.getAs[String]("ID") -> r).toMap
    assert(rows("7.0").getAs[String]("Status") == "offline") // updated
    assert(rows("999").getAs[String]("Status") == "y")       // untouched
    assert(rows("7.0").getAs[String]("Comment") == "keep")   // non-target col kept
    assert(updated.columns.contains("Toner Type"))           // column append
  }
}

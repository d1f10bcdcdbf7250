package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Pipeline, Stage}
import graft.sources.{DocumentIngest, SideTables}

/** Pipeline e2e (SURVEY.md §5.4): fixture document → full stage chain
  * (ingest → enrich employees → enrich locations → extract snapshot →
  * keyed upsert) with golden assertions on the final frame. */
class EnrichE2ESpec extends SparkSpec {
  import spark.implicits._

  private lazy val printers = DocumentIngest.printersUnified(
    DocumentIngest.readDocument(spark,
      getClass.getResource("/printers.json").getPath))

  // A3-shaped employees (header synonyms exercised in SourcesSpec; here
  // already canonical). Empty name for 212 must NOT clobber.
  private lazy val employees = Seq(
    ("105", "רות כהן", "0530000001"),
    ("212", "", "0521111111"),
    ("999", "orphan", "0500000000"))
    .toDF("id", "name", "phone")

  // A4-shaped locations with explicit source row index: branch 105 has
  // 3 rows — duplicate (primary, secondary) pair first, then a second
  // pair; later address wins; postal is the trailing 7-digit run.
  private lazy val locations = Seq(
    (0L, "105", "הרצל 1, תל אביב 6100001", "אינטרנט", "ראשי", "77001"),
    (1L, "105", "הרצל 1, תל אביב 6100001", "אינטרנט", "ראשי", "77002"),
    (2L, "105", "אלנבי 9, תל אביב 6100002", "טלפוניה", "משני", "88001"),
    (3L, "105", "אלנבי 9, תל אביב 6100002", "סיבים", "גיבוי", "99001"),
    (4L, "212", "דיזנגוף 50 תל אביב", "אינטרנט", "", "55001"))
    .toDF("row_idx", "branch_id", "address", "primary_desc",
      "secondary_desc", "subscriber")

  test("J1: non-empty-wins manager/phone + changed flags") {
    val out = Enrich.employees(printers, employees)
    val b105 = out.where($"ID" === "105").select("storeInfo.Manager",
      "storeInfo.Phone", "changed").collect().head
    assert(b105.getString(0) == "רות כהן")      // overwritten (non-empty)
    assert(b105.getString(1) == "0530000001")
    assert(b105.getBoolean(2))
    val b212 = out.where($"ID" === "212").select("storeInfo.Manager",
      "storeInfo.Phone", "changed").collect().head
    assert(b212.isNullAt(0))                     // empty name did NOT set
    assert(b212.getString(1) == "0521111111")    // phone did
    // company rows untouched, no join applied
    assert(out.where($"group" === "Company_Grouped" && $"changed").count() == 0)
  }

  test("J2: last-wins address, postal split, first-seen pair ranking") {
    val out = Enrich.locations(printers, locations)
    val b105 = out.where($"ID" === "105")
      .select("storeInfo.Location", "storeInfo.Postal",
        "storeInfo.firstDescription", "storeInfo.secondDescription")
      .collect().head
    assert(b105.getString(0) == "אלנבי 9, תל אביב") // row_idx=3 wins, postal stripped
    assert(b105.getString(1) == "6100002")
    val first = b105.getStruct(2)
    assert(first.getAs[String]("PrimaryDescription") == "אינטרנט") // first-seen pair
    assert(first.getAs[String]("LineID") == "77001")               // first subscriber
    val second = b105.getStruct(3)
    assert(second.getAs[String]("PrimaryDescription") == "טלפוניה") // rank 2; rank 3 dropped
    assert(second.getAs[String]("LineID") == "88001")
  }

  test("e2e: ingest → enrich → snapshot → upsert through the stage runner") {
    val sheet = Seq(
      ("105", "Branch 105", "old", "x"),
      ("7", "HQ floor", "old", "y"),
      ("404", "untouched", "old", "z"))
      .toDF("ID", "Name", "Status", "Comment")

    var snapshotStages = Vector.empty[String]
    val stages = Seq(
      Stage("enrich", "1_employees", df => Enrich.employees(df, employees).drop("changed")),
      Stage("enrich", "2_locations", df => Enrich.locations(df, locations)),
      Stage("extract", "snapshot", df => FleetSnapshot(df)),
      Stage("load", "upsert", df =>
        FleetSnapshot.updateSheet(sheet, FleetSnapshot.upsertIdMap(df))))
    val summary = Pipeline.run(printers, stages,
      (name, _) => snapshotStages :+= name)

    assert(summary.allOk, summary.failures.mkString(";"))
    assert(snapshotStages.size == 4)
    val rows = summary.out.collect().map(r => r.getAs[String]("ID") -> r).toMap
    // golden: branch 105 offline (doc says offline), HQ id 7 dup → last-wins offline
    assert(rows("105").getAs[String]("Status") == "offline")
    assert(rows("7").getAs[String]("Status") == "offline")
    assert(rows("404").getAs[String]("Status") == "old")     // untouched
    assert(rows("105").getAs[String]("Name") == "Branch 105") // non-target col kept
    assert(summary.out.columns.contains("Toner Type"))        // schema evolution
    // stage timing recorded
    assert(summary.results.forall(_.elapsedS >= 0.0))
  }
}

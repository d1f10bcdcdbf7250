package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PayloadParsersSpec extends SparkSpec {
  import spark.implicits._

  test("S8/F27: LEDM local-name query is namespace-insensitive, first non-empty wins") {
    val xml =
      """<psdyn:ProductStatusDyn xmlns:psdyn="http://x/psdyn">
        |  <psdyn:Status></psdyn:Status>
        |  <other:StatusCategory xmlns:other="http://y">ready</other:StatusCategory>
        |  <psdyn:AlertDetails>Toner low</psdyn:AlertDetails>
        |</psdyn:ProductStatusDyn>""".stripMargin
    val out = PayloadParsers.ledmStatus(Seq(("p1", xml)).toDF("ip", "xml"))
      .select("status", "problem", "severity").collect().head
    assert(out.getString(0) == "ready")      // empty Status skipped
    assert(out.getString(1) == "Toner Low")  // problem from AlertDetails
    assert(out.getString(2) == "warning")    // F21: "low" → warning
  }

  test("S8: ready/sleep normalization → informational") {
    val mk = (body: String) => s"<root><Status>$body</Status></root>"
    val df = Seq(("a", mk("Ready")), ("b", mk("sleep mode")), ("c", mk("")))
      .toDF("ip", "xml")
    val rows = PayloadParsers.ledmStatus(df)
      .select("ip", "problem", "severity").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("a") == ("Ready", "informational"))
    assert(rows("b") == ("Sleeping", "informational"))
    assert(rows("c") == ("Ready", "informational")) // blank → Ready
  }

  test("S8: EventTable rows explode with triage") {
    val xml =
      """<EventTable xmlns="http://z">
        |  <Event><EventCategory>7</EventCategory></Event>
        |  <Event><EventCategory>attention needed</EventCategory></Event>
        |  <Event><EventCategory>1</EventCategory></Event>
        |</EventTable>""".stripMargin
    val rows = PayloadParsers.ledmEvents(Seq(("p1", xml)).toDF("ip", "xml"), "ip")
      .orderBy("event_idx").collect()
    assert(rows.map(_.getAs[String]("category")).toSeq ==
      Seq("7", "attention needed", "1"))
    assert(rows.map(_.getAs[String]("severity")).toSeq ==
      Seq("critical", "warning", "informational"))
  }

  test("S9/F23: Brother bar heights zip labels, clamp, pretty colors") {
    val html =
      """<table id="inkLevel"><tr>
        |  <td><img alt="BK" style="height:42" /></td>
        |  <td><img alt="C" style="height:130" /></td>
        |  <td><img alt="M" height="0" /></td>
        |  <td><img alt="Y" style="height:7" /></td>
        |</tr></table>""".stripMargin
    val rows = PayloadParsers.brotherInkLevels(
      Seq(("p1", html)).toDF("ip", "html"), "ip")
      .orderBy("bar_idx").collect()
    assert(rows.map(_.getAs[String]("cartridge")).toSeq ==
      Seq("Black", "Cyan", "Magenta", "Yellow"))
    assert(rows.map(_.getAs[String]("remaining_percent")).toSeq ==
      Seq("42%", "100%", "0%", "7%")) // 130 clamps to 100
  }

  test("S11: catalog accepts list shape AND map shape") {
    val listJson =
      """[{"code": "C4-1001", "status": "warning", "info": "Toner low"},
        |  {"code": "", "status": "x", "info": "dropped"}]""".stripMargin
    val mapJson =
      """{"E2-210": {"status": "critical", "info": "Fuser"},
        |  "B1-100": {"status": "info", "info": null}}""".stripMargin
    val out = PayloadParsers.codeCatalog(Seq(listJson, mapJson).toDF("json"))
      .orderBy("code").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      ("B1-100", "info", null),
      ("C4-1001", "warning", "Toner low"),
      ("E2-210", "critical", "Fuser")))
  }
}

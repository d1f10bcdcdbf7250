package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PayloadParsersSpec extends SparkSpec {
  import spark.implicits._

  test("S8/F27: problem_from_status — document-order candidates, category mapping") {
    val xml1 =
      """<psdyn:ProductStatusDyn xmlns:psdyn="http://x/psdyn">
        |  <psdyn:LocString>  </psdyn:LocString>
        |  <psdyn:StatusMessage>Tray 2 jam</psdyn:StatusMessage>
        |  <psdyn:StatusString>later in doc order</psdyn:StatusString>
        |</psdyn:ProductStatusDyn>""".stripMargin
    val xml2 = """<r><StatusCategory>interventionrequired</StatusCategory></r>"""
    val xml3 = """<r><StatusCategory>custommode</StatusCategory></r>"""
    val rows = PayloadParsers.ledmStatus(
      Seq(("a", xml1), ("b", xml2), ("c", xml3)).toDF("ip", "xml"), "ip")
      .select("ip", "problem", "severity").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    // blank LocString skipped; StatusMessage wins by DOCUMENT order
    assert(rows("a") == ("Tray 2 jam", "critical")) // F21: "jam" → critical
    assert(rows("b") == ("Needs attention", "warning")) // F21: "attention"
    assert(rows("c") == ("Custommode", "informational")) // capitalize fallback
  }

  test("S8: ready/sleep/unknown normalization → informational") {
    val mk = (body: String) => s"<root><LocString>$body</LocString></root>"
    val df = Seq(("a", mk("Ready")), ("b", mk("InPowerSave")),
      ("c", "<root/>"), ("d", mk("device state unknown"))).toDF("ip", "xml")
    val rows = PayloadParsers.ledmStatus(df, "ip")
      .select("ip", "problem", "severity").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("a") == ("Ready", "informational"))
    assert(rows("b") == ("Sleeping", "informational")) // inpowersave substring
    assert(rows("c") == ("Normal", "informational"))   // Unknown → null → Normal
    assert(rows("d") == ("Normal", "informational"))   // "unknown" substring
  }

  test("S8: EventTable election — rank by Severity, >= keeps the LAST max") {
    val xml =
      """<EventTable xmlns="http://z">
        |  <Event><Severity>Warning</Severity><Code>W1</Code>
        |    <Description>Toner low</Description></Event>
        |  <Event><Severity>StrictError</Severity><EventCode>E1</EventCode>
        |    <Reason>Door open</Reason></Event>
        |  <Event><Severity>ERROR</Severity><ID>E2</ID><Name>Fuser fault</Name></Event>
        |  <Event><Code>ignored-no-severity</Code></Event>
        |</EventTable>""".stripMargin
    val events = PayloadParsers.ledmEvents(Seq(("p1", xml)).toDF("ip", "xml"), "ip")
    assert(events.orderBy("event_idx").collect().map(_.getAs[String]("severity")).toSeq ==
      Seq("Warning", "StrictError", "ERROR", null))
    val best = PayloadParsers.ledmBestEvents(events, "ip").collect().head
    // StrictError and ERROR both rank 3; ties → last (idx 2)
    assert(best.getAs[String]("ev_code") == "E2")
    assert(best.getAs[String]("ev_problem") == "Fuser fault")
    assert(best.getAs[String]("ev_severity") == "critical")
  }

  test("S8: full chain — event beats alert beats status text") {
    val statusXml =
      """<ProductStatusDyn>
        |  <LocString>Ready</LocString>
        |  <Alert><Severity>Warning</Severity>
        |    <ProductStatusAlertID>A100</ProductStatusAlertID>
        |    <AlertDetailsUserAction>Replace cartridge soon</AlertDetailsUserAction></Alert>
        |</ProductStatusDyn>""".stripMargin
    val eventsXml =
      """<EventTable><Event><Severity>Info</Severity>
        |<Description>Calibrating</Description></Event></EventTable>""".stripMargin
    val df = Seq(("p1", statusXml, eventsXml), ("p2", statusXml, null))
      .toDF("ip", "status_xml", "events_xml")
    val rows = PayloadParsers.ledmProblemSeverity(df, "ip")
      .select("ip", "problem", "severity").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    // p1: event desc + event severity win (Info → informational)
    assert(rows("p1") == ("Calibrating", "informational"))
    // p2: no events → alert election wins over the Ready status text
    assert(rows("p2") == ("Replace cartridge soon", "warning"))
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

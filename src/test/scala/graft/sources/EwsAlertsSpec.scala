package graft.sources

import graft.SparkSpec

class EwsAlertsSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Seq(
    ("C4-1001", "ATTENTION", "Toner is low"),
    ("E2-210", "CRITICAL", "")).toDF("code", "status", "info")

  test("F26: HTML rows — header skip, longest-cell desc, code head strip") {
    val html =
      """<table>
        |<tr><td>Description</td><td>Status Code</td></tr>
        |<tr><td><img alt="Warning"/></td>
        |    <td>C4-1001 : Toner low on black</td><td>sc</td></tr>
        |<tr><td>Paper jam in tray</td><td>X</td></tr>
        |</table>""".stripMargin
    val rows = EwsAlerts.alertsFromHtml(Seq(("p1", html)).toDF("ip", "html"), "ip")
      .orderBy("alert_idx").collect()
      .map(r => (r.getAs[String]("severity"), r.getAs[String]("status_code"),
        r.getAs[String]("description")))
    assert(rows.toSeq == Seq(
      // img alt severity; code found in desc and stripped off its head
      ("Warning", "C4-1001", "Toner low on black"),
      // no img: severity = shortest non-empty cell
      ("X", "", "Paper jam in tray")))
  }

  test("F26: ExtJS grid rows win over <tr>; first-seen dedup") {
    val html =
      """<div class="x-grid3-body">
        |<div class="x-grid3-row"><div class="x-grid3-cell-inner">Door open</div>
        |  <div class="x-grid3-cell-inner">E2-210</div></div>
        |<div class="x-grid3-row"><div class="x-grid3-cell-inner">Door open</div>
        |  <div class="x-grid3-cell-inner">E2-210</div></div>
        |</div>
        |<table><tr><td>ignored tr fallback</td></tr></table>""".stripMargin
    val rows = EwsAlerts.alertsFromHtml(Seq(("p1", html)).toDF("ip", "html"), "ip")
      .collect()
    assert(rows.length == 1) // duplicate grid row deduped, tr path unused
    assert(rows.head.getAs[String]("description") == "Door open")
    // the E2-210 cell is shorter → severity; desc has no code to strip
    assert(rows.head.getAs[String]("severity") == "E2-210")
  }

  test("A4: pick — catalog-refined rank, has_code break, stable ties") {
    val alerts = Seq(
      // rank 0 but cataloged code → refined to ATTENTION=5, has_code=1
      ("p1", 0, "", "C4-1001", "Toner low on black"),
      ("p1", 1, "Warning", "", "Door open wide"), // rank 3
      // stable tie: same (rank,has_code) → earliest index wins
      ("p2", 0, "Warning", "", "first"),
      ("p2", 1, "Warning", "", "second"))
      .toDF("ip", "alert_idx", "severity", "status_code", "description")
    val picked = EwsAlerts.pickAlert(alerts, "ip", catalog).collect()
      .map(r => r.getAs[String]("ip") ->
        (r.getAs[String]("code"), r.getAs[String]("description"))).toMap
    assert(picked("p1") == ("C4-1001", "Toner low on black"))
    assert(picked("p2") == ("", "first"))
  }

  test("A4: code backfilled from description via CODE_RE") {
    val alerts = Seq(("p1", 0, "error", "", "Fuser unit E2-210 failed"))
      .toDF("ip", "alert_idx", "severity", "status_code", "description")
    val picked = EwsAlerts.pickAlert(alerts, "ip", catalog).collect().head
    assert(picked.getAs[String]("code") == "E2-210")
  }

  test("F17/F19/F20: full composition — catalog info, keyword label, no-alert Ready") {
    val devices = Seq("p1", "p2", "p3", "p4").toDF("ip")
    val alerts = Seq(
      ("p1", 0, "", "C4-1001", "whatever text"),      // catalog info wins
      ("p3", 0, "3", "", "printer scanner failed"),   // keyword label path
      ("p4", 0, "", "E2-210", "x"))                   // blank catalog info
      .toDF("ip", "alert_idx", "severity", "status_code", "description")
    val out = EwsAlerts.problemSeverity(devices, alerts, catalog, "ip")
      .select("ip", "problem", "severity").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    // catalog info + ATTENTION status → warning (exact-match triage)
    assert(out("p1") == ("Toner is low", "warning"))
    // no alerts: empty pick → Normal → Ready, informational
    assert(out("p2") == ("Ready", "informational"))
    // uncataloged: keyword decision list + digit-rank base severity
    assert(out("p3") == ("Scanner error", "warning"))
    // cataloged but blank info → "Check printer", severity from CRITICAL
    assert(out("p4") == ("Check printer", "critical"))
  }
}

package graft.tickets

import graft.SparkSpec
import graft.sources.DocumentIngest

class TicketsSpec extends SparkSpec {

  private lazy val printers = DocumentIngest.printersUnified(
    DocumentIngest.readDocument(spark,
      getClass.getResource("/printers.json").getPath))

  test("P7: id lookup — numeric compare with string fallback") {
    // "7.0" and " 7\n" both live in Company; searching id=7 matches the
    // numeric one ("7.0" casts to 7) and the trimmed string one.
    val hits = TicketSearch.byField(printers, "Company_Grouped", "id", "7")
    assert(hits.count() == 2)
    val none = TicketSearch.byField(printers, "Branches_Grouped", "id", "7")
    assert(none.count() == 0)
  }

  test("P7: serial is case-insensitive, ip exact") {
    assert(TicketSearch.byField(printers, "Branches_Grouped", "serial",
      "e78k011223").count() == 1)
    assert(TicketSearch.byField(printers, "Branches_Grouped", "ip",
      " 10.5.0.12 ").count() == 1)
  }

  test("P8/A7: extract — branch fields, company constants, ordered colors") {
    val b = TicketSearch.extract(
      TicketSearch.byField(printers, "Branches_Grouped", "id", "212"))
      .collect().head
    assert(b.getAs[String]("customer") == "Branch 212")
    assert(b.getAs[String]("branch_id") == "212")
    // first-seen order preserved: cyan, Magenta ink, Y
    assert(b.getSeq[String](b.fieldIndex("colors")).toSeq ==
      Seq("cyan", "Magenta ink", "Y"))

    val c = TicketSearch.extract(
      TicketSearch.byField(printers, "Company_Grouped", "serial", "PHB8C12345"))
      .collect().head
    assert(c.getAs[String]("customer") == "Headquarters")
    assert(c.getAs[String]("branch_id") == "-")
    assert(c.getAs[String]("address") == "-") // no storeInfo for Company
  }

  test("F28/A9: render — RTL html, escaping, qty total, subject suffix") {
    val t = Ticket("Branch <105>", "105", "E78K011223", "MFC-L9570CDW",
      "הרצל 1, תל אביב", "דנה לוי", "0540000000", Seq("Black", "Cyan"))
    val items = Seq(TicketItem("Black", 2), TicketItem("Cyan", 1))
    val subject = TonerOrder.subject(t, items)
    assert(subject == "הזמנת טונר - Branch <105> [105]")
    val html = TonerOrder.html(t, items)
    assert(html.contains("dir=\"rtl\""))
    assert(html.contains("Branch &lt;105&gt;")) // escaped
    assert(html.contains("הזמנת טונר (3)"))      // qty total A9
    assert(html.contains("Black × 2, Cyan × 1")) // items display
    assert(!html.contains("<105>"))

    // Company ticket: no branch suffix
    val tc = t.copy(branchId = "-")
    assert(!TonerOrder.subject(tc, items).contains("["))
    // plugin alias map resolves
    assert(TicketPlugins.byAlias("technician").name == "tech")
  }
}

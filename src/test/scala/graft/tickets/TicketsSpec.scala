package graft.tickets

import graft.SparkSpec
import graft.sources.DocumentIngest

class TicketsSpec extends SparkSpec {

  private lazy val printers = DocumentIngest.printersUnified(
    DocumentIngest.readDocument(spark,
      getClass.getResource("/printers.json").getPath))

  test("P7: id lookup — int() compare with string fallback") {
    // "7.0" and " 7\n" both live in Company as STRINGS; Python's
    // int("7.0") raises (TonerOrder.py:26-30), so only the
    // whitespace-trimmed integer literal " 7\n" matches id=7 — the
    // float-looking string falls to the (failing) string compare.
    val hits = TicketSearch.byField(printers, "Company_Grouped", "id", "7")
    assert(hits.count() == 1)
    val none = TicketSearch.byField(printers, "Branches_Grouped", "id", "7")
    assert(none.count() == 0)
  }

  test("P7: a NUMERIC id column truncates like Python int(7.9)") {
    import spark.implicits._
    val df = Seq((7.9, "Company_Grouped"), (8.0, "Company_Grouped"))
      .toDF("ID", "group")
    // int(7.9) == int("7") → truncation, not rounding
    assert(TicketSearch.byField(df, "Company_Grouped", "id", "7").count() == 1)
    assert(TicketSearch.byField(df, "Company_Grouped", "id", "8").count() == 1)
  }

  test("P7: serial is case-insensitive, ip exact") {
    assert(TicketSearch.byField(printers, "Branches_Grouped", "serial",
      "e78k011223").count() == 1)
    assert(TicketSearch.byField(printers, "Branches_Grouped", "ip",
      " 10.5.0.12 ").count() == 1)
  }

  test("P8/A7: extract — constant customer, company constants, ordered colors") {
    val b = TicketSearch.extract(
      TicketSearch.byField(printers, "Branches_Grouped", "id", "212"))
      .collect().head
    // customer is the fixed retailer name for BOTH groups (TonerOrder.py:60-67)
    assert(b.getAs[String]("customer") == "סטימצקי")
    assert(b.getAs[String]("branch_id") == "212")
    assert(b.getAs[String]("group") == "Branches_Grouped")
    // first-seen order preserved: cyan, Magenta ink, Y
    assert(b.getSeq[String](b.fieldIndex("colors")).toSeq ==
      Seq("cyan", "Magenta ink", "Y"))

    val c = TicketSearch.extract(
      TicketSearch.byField(printers, "Company_Grouped", "serial", "PHB8C12345"))
      .collect().head
    assert(c.getAs[String]("customer") == "סטימצקי")
    assert(c.getAs[String]("branch_id") == "3") // ID kept, not blanked
    assert(c.getAs[String]("address") == "מתחם לב הארץ 0, ראש העין שדרות הדלקים")
    assert(c.getAs[String]("contact") == "דימה")
    assert(c.getAs[String]("phone") == "0542050462")
  }

  test("F28/A9: subject base+model segment, exact template render") {
    val t = Ticket("סטימצקי", "105", "E78K011223", "MFC-L9570CDW",
      "הרצל 1, תל אביב", "דנה <לוי>", "0540000000", "Branches_Grouped",
      Seq("Black", "Cyan"))
    // subject: '<base> - customer | model [bid]' (TonerOrder.py:152-160)
    assert(TonerOrder.subject(t) ==
      "הזמנת טונרים - סטימצקי | MFC-L9570CDW [105]")
    assert(DrumOrder.subject(t) ==
      "הזמנת דרמים - סטימצקי | MFC-L9570CDW [105]")
    assert(PrinterTechnician.subject(t) ==
      "פתיחת קריאת שירות - סטימצקי | MFC-L9570CDW [105]")
    // blank model drops its segment
    assert(TonerOrder.subject(t.copy(model = "")) ==
      "הזמנת טונרים - סטימצקי [105]")
    // Company group: no branch suffix even with a non-blank id
    assert(!TonerOrder.subject(t.copy(group = "Company_Grouped")).contains("["))

    val items = Seq(TicketItem("Black", 2), TicketItem("Cyan", 1))
    val html = TonerOrder.html(t, items)
    assert(html.startsWith(
      "<div dir=\"rtl\" style=\"font-family:Arial, sans-serif;line-height:1.6;font-size:14px;\">"))
    assert(html.contains("<th colspan=\"2\"")) // header row
    assert(html.contains("הזמנות טונרים"))      // toner title
    assert(html.contains("Black × 2, Cyan × 1")) // multi-item display
    assert(html.contains(">3</td>"))             // qty total A9
    assert(html.contains("דנה &lt;לוי&gt;"))     // escaped contact
    assert(!html.contains("<לוי>"))
    // single item renders the bare color and its own qty
    val one = TonerOrder.html(t, Seq(TicketItem("Black", 2)))
    assert(one.contains(">Black</td>") && one.contains(">2</td>"))
    // drum: empty items → ("", 0)
    val drum = DrumOrder.html(t, Nil)
    assert(drum.contains("סוג דרם") && drum.contains(">0</td>"))
    // tech: remarks + recipient rows
    val tech = PrinterTechnician.html(t, Nil, notes = "a & b", toAddr = "x@y")
    assert(tech.contains("פתיחת קריאה למדפסת"))
    assert(tech.contains("a &amp; b") && tech.contains("x@y"))
    // plugin alias map resolves
    assert(TicketPlugins.byAlias("technician").name == "tech")
  }

  test("a9 column renderer agrees byte-for-byte with the row-level plugin") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Adversarial tickets: escaping in every field, empty model (falsy
    // subject part), blank-vs-set branch id across both groups, and
    // 0/1/3-item carts (bare qty vs summed total vs empty render).
    val tickets = Seq(
      ("a&b <x>", "12", "sn'1", "M\"1", "Ad<dr", "c&c", "05'0",
        "Branches_Grouped", Seq("Black&White"), Seq(3)),
      ("סטימצקי", "", "sn2", "", "Addr", "Mgr", "052",
        "Branches_Grouped", Seq("Black", "Cy<an", "Yellow"), Seq(2, 1, 4)),
      ("c", " 7 ", "sn3", "M3", "A", "m", "05",
        "Company_Grouped", Seq.empty[String], Seq.empty[Int]))
    val df = tickets.toDF("customer", "bid", "serial", "model", "address",
      "contact", "phone", "group", "labels", "qtys")
    val rendered = df.select(
      TonerOrder.subjectCol(col("customer"), col("model"), col("group"),
        col("bid")).as("subject"),
      TonerOrder.htmlCol(col("customer"), col("serial"), col("model"),
        col("address"), col("contact"), col("phone"), col("labels"),
        col("qtys")).as("html")).collect()
    tickets.zip(rendered).foreach { case (t, row) =>
      val ticket = Ticket(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, Nil)
      val items = t._9.zip(t._10).map { case (l, q) => TicketItem(l, q) }
      assert(row.getString(0) == TonerOrder.subject(ticket))
      assert(row.getString(1) == TonerOrder.html(ticket, items))
    }
  }

  test("a9b/a9c column renderers match row-level, incl. null group + padded bid") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The two branches the a9 parity rows never reached: a NULL group
    // (Python fields.get("group","") != 'Company_Grouped' is TRUE for a
    // missing group → ' [bid]' suffix still fires) and a TAB/space-
    // padded bid whose suffix renders STRIPPED. Plus Company-group
    // suffix suppression, empty-items drum render, tech's null toAddr.
    val tickets = Seq(
      ("a&b <x>", "\t12 ", "sn'1", "M\"1", "Ad<dr", "c&c", "05'0",
        null: String, Seq("DR<um>&1"), Seq(3), "note & \"q\"\nline2", "x@y"),
      ("c", " 7 ", "sn3", "M3", "A", "m", "05",
        "Company_Grouped", Seq.empty[String], Seq.empty[Int], "n",
        null: String),
      ("סטימצקי", "", "sn2", "", "Addr", "Mgr", "052",
        "Branches_Grouped", Seq("T1"), Seq(2), "", ""))
    val df = tickets.toDF("customer", "bid", "serial", "model", "address",
      "contact", "phone", "group", "labels", "qtys", "notes", "toAddr")
    val rendered = df.select(
      DrumOrder.subjectCol(col("customer"), col("model"), col("group"),
        col("bid")).as("dsub"),
      DrumOrder.htmlCol(col("customer"), col("serial"), col("model"),
        col("address"), col("contact"), col("phone"), col("labels"),
        col("qtys")).as("dhtml"),
      PrinterTechnician.subjectCol(col("customer"), col("model"),
        col("group"), col("bid")).as("tsub"),
      PrinterTechnician.htmlCol(col("customer"), col("serial"), col("model"),
        col("address"), col("contact"), col("phone"), col("notes"),
        col("toAddr")).as("thtml"),
      TonerOrder.subjectCol(col("customer"), col("model"), col("group"),
        col("bid")).as("osub")).collect()
    tickets.zip(rendered).foreach { case (t, row) =>
      val ticket = Ticket(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, Nil)
      val items = t._9.zip(t._10).map { case (l, q) => TicketItem(l, q) }
      assert(row.getString(0) == DrumOrder.subject(ticket))
      assert(row.getString(1) == DrumOrder.html(ticket, items))
      assert(row.getString(2) == PrinterTechnician.subject(ticket))
      assert(row.getString(3) == PrinterTechnician.html(ticket, items,
        notes = t._11, toAddr = Option(t._12).getOrElse("")))
      assert(row.getString(4) == TonerOrder.subject(ticket))
    }
  }
}

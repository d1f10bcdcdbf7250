package graft.tickets

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** Ticketing (SURVEY.md §3.3): point lookup → projection → pure HTML
  * render. The reference's three ticket plugins share search/extract
  * and differ in items collected + template
  * (plugins/openticket/TonerOrder.py, DrumOrder.py,
  * PrinterTechnician.py — the trio is structurally identical :26-82).
  *
  * Engine/app split (SURVEY.md §7.4 hard part 6): search + extract +
  * render are pure and live here; prompting and mail delivery are app
  * shell, out of engine scope.
  */
final case class Ticket(
    customer: String, branchId: String, serial: String, model: String,
    address: String, contact: String, phone: String,
    colors: Seq[String])

final case class TicketItem(color: String, qty: Int)

object TicketSearch {

  /** P7 — field-equality lookup within a chosen group
    * (TonerOrder.py:26-48): `id` compares numerically with string
    * fallback, `serial` case-insensitively, `ip` exactly (trimmed). */
  def byField(printers: DataFrame, group: String, field: String,
      value: String): DataFrame = {
    val v = lit(value)
    val cond: Column = field match {
      case "id" =>
        // int(float(v)) compare like the reference (handles "7.0"),
        // string-trim fallback otherwise.
        val idNum = col("ID").cast("string").try_cast("double")
        val vNum = v.try_cast("double")
        (idNum.isNotNull && vNum.isNotNull && idNum === vNum) ||
          trim(col("ID").cast("string")) === trim(v)
      case "serial" => upper(trim(col("Serial"))) === upper(trim(v))
      case "ip"     => trim(col("Printer IP")) === trim(v)
      case other    => throw new IllegalArgumentException(s"field: $other")
    }
    printers.where(col("group") === group && cond)
  }

  /** P8 + A7 — projection to ticket fields (TonerOrder.py:59-82):
    * model = Model else Type; Company group gets constant
    * customer/branch; colors = first-seen-ordered distinct cartridge
    * names (array order = stored order, :50-57). */
  def extract(found: DataFrame): DataFrame = {
    val isCompany = col("group") === "Company_Grouped"
    val model =
      if (found.columns.contains("Model")) coalesce(col("Model"), col("Type"))
      else col("Type")
    val si = if (found.columns.contains("storeInfo")) col("storeInfo")
             else lit(null)
    found.select(
      when(isCompany, lit("Headquarters")).otherwise(coalesce(col("Name"),
        concat(lit("Branch "), col("ID")))).as("customer"),
      when(isCompany, lit("-")).otherwise(col("ID").cast("string")).as("branch_id"),
      coalesce(col("Serial"), lit("-")).as("serial"),
      coalesce(model, lit("-")).as("model"),
      coalesce(si.getField("Location"), lit("-")).as("address"),
      coalesce(si.getField("Manager"), lit("-")).as("contact"),
      coalesce(si.getField("Phone"), lit("-")).as("phone"),
      coalesce(array_distinct(transform(
        col("printerInfo").getField("cartridges"),
        c => c.getField("cartridge"))), array()).as("colors"))
  }

  def toTicket(r: Row): Ticket = Ticket(
    r.getAs[String]("customer"), r.getAs[String]("branch_id"),
    r.getAs[String]("serial"), r.getAs[String]("model"),
    r.getAs[String]("address"), r.getAs[String]("contact"),
    r.getAs[String]("phone"),
    r.getSeq[String](r.fieldIndex("colors")).toSeq)
}

/** One ticket family: subject + HTML (F28, TonerOrder.py:152-195). */
trait TicketPlugin {
  def name: String
  def subject(t: Ticket, items: Seq[TicketItem]): String
  def html(t: Ticket, items: Seq[TicketItem]): String

  /** html.escape equivalent (quote=True). */
  protected def esc(s: String): String =
    Option(s).getOrElse("").replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;").replace("'", "&#x27;")

  /** Subject suffix: branch id in brackets only when meaningful
    * (TonerOrder.py:147-150). */
  protected def branchSuffix(t: Ticket): String =
    if (t.branchId != null && t.branchId.nonEmpty && t.branchId != "-")
      s" [${t.branchId}]" else ""

  /** RTL two-column detail table shared by the three templates. */
  protected def detailRows(t: Ticket, extra: Seq[(String, String)]): String = {
    val base = Seq(
      "לקוח" -> t.customer, "מס' סניף" -> t.branchId, "מק\"ט" -> t.serial,
      "דגם" -> t.model, "כתובת" -> t.address, "איש קשר" -> t.contact,
      "טלפון" -> t.phone)
    (base ++ extra).map { case (k, v) =>
      s"<tr><td><b>${esc(k)}</b></td><td>${esc(v)}</td></tr>"
    }.mkString("\n")
  }

  protected def wrap(title: String, rows: String): String =
    s"""<html dir="rtl"><body>
       |<h3>${esc(title)}</h3>
       |<table border="1" cellpadding="4" cellspacing="0">
       |$rows
       |</table>
       |</body></html>""".stripMargin

  /** A9 — Σ qty (TonerOrder.py:170-175). */
  protected def qtyTotal(items: Seq[TicketItem]): Int = items.map(_.qty).sum

  /** Multi-item "color × qty" display join (TonerOrder.py:164-169). */
  protected def itemsDisplay(items: Seq[TicketItem]): String =
    items.map(i => s"${i.color} × ${i.qty}").mkString(", ")
}

object TonerOrder extends TicketPlugin {
  val name = "toner"
  def subject(t: Ticket, items: Seq[TicketItem]): String =
    s"הזמנת טונר - ${t.customer}${branchSuffix(t)}"
  def html(t: Ticket, items: Seq[TicketItem]): String =
    wrap(s"הזמנת טונר (${qtyTotal(items)})",
      detailRows(t, Seq("פריטים" -> itemsDisplay(items))))
}

object DrumOrder extends TicketPlugin {
  val name = "drum"
  def subject(t: Ticket, items: Seq[TicketItem]): String =
    s"הזמנת תוף - ${t.customer}${branchSuffix(t)}"
  def html(t: Ticket, items: Seq[TicketItem]): String =
    wrap(s"הזמנת תוף (${qtyTotal(items)})",
      detailRows(t, Seq("פריטים" -> itemsDisplay(items))))
}

object PrinterTechnician extends TicketPlugin {
  val name = "tech"
  def subject(t: Ticket, items: Seq[TicketItem]): String =
    s"קריאת טכנאי - ${t.customer}${branchSuffix(t)}"
  def html(t: Ticket, items: Seq[TicketItem]): String =
    wrap("קריאת טכנאי", detailRows(t, Seq.empty))
}

object TicketPlugins {
  /** Alias map (core/openticket/plugins.py:7-36). */
  val byAlias: Map[String, TicketPlugin] = Map(
    "toner" -> TonerOrder, "drum" -> DrumOrder, "tech" -> PrinterTechnician,
    "technician" -> PrinterTechnician)
}

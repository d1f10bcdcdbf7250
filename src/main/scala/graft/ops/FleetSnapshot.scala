package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** The `extract_info` flattening (SURVEY.md §7.2 slice 0): unified
  * printer records → one flat sheet-update row per printer with the
  * columns the reference writes back to Excel
  * (core/excel/update_from_json.py:77-124, result column list :191).
  *
  * Semantics carried over:
  *  - status classified through the keyword chain (F4, :42-58);
  *  - per-color percent columns Black/Cyan/Magenta/Yellow: FIRST
  *    cartridge in stored array order whose normalized color matches
  *    (first-wins, :104; normalize F3 :28-40), numeric value parsed out
  *    of the formatted "37%" string;
  *  - Error/Severity from the printerError struct;
  *  - Toner Type display string = first-seen-ordered distinct joined
  *    ", " (A10, :114-123) over the unified array;
  *  - blanks dashed at the edge (F5, :60-65).
  *
  * Everything is a narrow projection — no shuffle at any scale.
  */
object FleetSnapshot {

  private val Colors = Seq("Black", "Cyan", "Magenta", "Yellow")

  /** First-wins percent for one color out of the cartridges array:
    * array order = stored order, so `filter` + head IS the reference's
    * first-match loop. Returns a long (numeric percent) or null. */
  def colorPercent(cartridges: Column, color: String): Column = {
    val hits = filter(cartridges,
      c => Normalize.normalizeColor(c.getField("cartridge")) === color)
    // get() is 0-based and null-safe on empty arrays (ANSI mode would
    // make element_at(hits, 1) throw when no cartridge matches).
    val pct = get(hits, lit(0)).getField("remaining_percent")
    regexp_extract(pct, "(-?\\d+)", 1).try_cast("long")
  }

  /** Printers (DocumentIngest.printersUnified shape) → flat snapshot. */
  def apply(printers: DataFrame): DataFrame = {
    val pi = col("printerInfo")
    val carts = coalesce(pi.getField("cartridges"),
      expr("array()").cast("array<struct<cartridge:string,remaining_percent:string>>"))
    val colorCols = Colors.map(c => colorPercent(carts, c).as(c))
    printers.select(
      Seq(col("group"), col("row_idx"),
        Normalize.canonicalizeId(col("ID")).as("id"),
        Normalize.statusOnlineOffline(pi.getField("status")).as("Status"))
        ++ colorCols ++ Seq(
        Normalize.dashIfBlank(pi.getField("printerError").getField("problem"))
          .as("Error"),
        Normalize.dashIfBlank(pi.getField("printerError").getField("severity"))
          .as("Severity"),
        Normalize.dashIfBlank(
          concat_ws(", ", array_distinct(pi.getField("tonerType"))))
          .as("Toner Type")): _*)
  }

  /** J3: last-wins id→snapshot map then keyed upsert into a sheet
    * (update_from_json.py:126-135 — later records overwrite earlier
    * ones — and :187-212 — only matching sheet rows change).
    * `last-wins` is made deterministic with max_by over the explicit
    * source row index (SURVEY.md §4.3). At lake scale this is the
    * MERGE INTO shape: broadcast the small id-map side. */
  def upsertIdMap(snapshot: DataFrame): DataFrame = {
    val valueCols = snapshot.columns.filterNot(Seq("group", "row_idx", "id").contains)
    snapshot
      .groupBy("id")
      .agg(max_by(struct(valueCols.map(col): _*), col("row_idx")).as("v"))
      .select(col("id") +: valueCols.map(c => col(s"v.`$c`").as(c)): _*)
  }

  /** Legacy header upgrade (SURVEY.md §7.4 hard part 3,
    * update_from_json.py:167-177): when no "Toner Type" column exists,
    * the FIRST column headed "type" (case-insensitive, trimmed) is
    * renamed to "Toner Type" — faithfully including the reference's
    * quirk that this may claim the model column on legacy sheets. */
  def upgradeHeaders(sheet: DataFrame): DataFrame = {
    val lower = sheet.columns.map(_.trim.toLowerCase)
    if (lower.contains("toner type")) sheet
    else lower.indexOf("type") match {
      case -1 => sheet
      case i => sheet.withColumnRenamed(sheet.columns(i), "Toner Type")
    }
  }

  /** Apply the id-map to a sheet: rows with a matching canonical ID take
    * the new values; others pass through unchanged (left join +
    * conditional update — the reference's "update only matching rows"). */
  def updateSheet(sheet: DataFrame, idMap: DataFrame): DataFrame = {
    // Qualify through the frame refs: Spark's default case-insensitive
    // resolution would otherwise see sheet.ID and idMap.id as ambiguous.
    val sheetId = Normalize.canonicalizeId(sheet("ID"))
    val updatable = idMap.columns.filterNot(_ == "id")
    val joined = sheet.join(broadcast(idMap), sheetId === idMap("id"), "left")
    val updated = sheet.columns.map { c =>
      if (updatable.contains(c))
        when(idMap("id").isNotNull, idMap(c)).otherwise(sheet(c)).as(c)
      else sheet(c).as(c)
    } ++ updatable.filterNot(sheet.columns.contains).map(c => idMap(c).as(c))
    joined.select(updated: _*)
  }
}

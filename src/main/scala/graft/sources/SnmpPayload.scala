package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** SNMP payload → cartridges: the reference's `get_snmp_toner` pipeline
  * (adapters/snmp_toner.py:90-138) as declarative relational transforms
  * over walk rows `(ip, oid, value)` — SURVEY.md §2 A1 (pivot), J4
  * (colorant join), F9/F10/F11/F13 (percent/format/color/OID parse).
  *
  * All expressions are built-in (codegen'd); the only shuffles are the
  * two pivot groupBys and the final per-device collect — each keyed by
  * device, so at fleet scale the plan is embarrassingly parallel with
  * map-side partial aggregation.
  */
object SnmpPayload {

  val SuppliesBase = "1.3.6.1.2.1.43.11.1.1"
  val ColorantBase = "1.3.6.1.2.1.43.12.1.1.4"

  /** Toner-ish supply types kept by the reference (snmp_toner.py:109-110). */
  val TonerTypes: Seq[Int] = Seq(3, 5, 6, 10, 21)

  /** Supplies table: OID triples → one row per (ip, marker, rowIdx) with
    * columns colorant_link/type/desc/unit/max/level (A1 pivot;
    * snmp_toner.py:91-105). Column ids per the prtMarkerSupplies layout
    * the reference walks: 3=colorant-link 5=type 6=description
    * 7=supply-unit 8=max-capacity 9=level. */
  def suppliesTable(walk: DataFrame): DataFrame = {
    val parts = split(col("oid"), "\\.")
    val i = array_position(parts, lit("43"))
    def p(off: Int): Column = element_at(parts, (i + off).cast("int"))
    walk
      .where(i > 0 && p(1) === "11")
      .select(col("ip"),
        p(4).try_cast("int").as("colId"),
        p(5).try_cast("int").as("marker"),
        p(6).try_cast("int").as("rowIdx"),
        col("value"))
      .groupBy("ip", "marker", "rowIdx")
      .pivot("colId", Seq(3, 5, 6, 7, 8, 9))
      .agg(first("value"))
      .select(col("ip"), col("marker"), col("rowIdx"),
        col("3").try_cast("int").as("colorant_idx"),
        col("5").try_cast("int").as("supply_type"),
        col("6").as("description"),
        col("7").try_cast("int").as("unit"),
        col("8").try_cast("long").as("max_capacity"),
        col("9").try_cast("long").as("level"))
  }

  /** Colorant-name table keyed (ip, marker, colorant_idx)
    * (snmp_toner.py:47-59). */
  def colorantTable(walk: DataFrame): DataFrame = {
    val parts = split(col("oid"), "\\.")
    val i = array_position(parts, lit("43"))
    def p(off: Int): Column = element_at(parts, (i + off).cast("int"))
    walk
      .where(i > 0 && p(1) === "12" && p(4) === "4")
      .select(col("ip"),
        p(5).try_cast("int").as("marker"),
        p(6).try_cast("int").as("colorant_idx"),
        col("value").as("colorant_name"))
  }

  /** Full pipeline: supplies ⋈ colorant (J4: defaults marker→1,
    * colorant→0 on null, snmp_toner.py:112-129) → type filter →
    * percent (F9/F10) + friendly color (F11) → per-device cartridge
    * array in ascending SNMP row order (W3, snmp_toner.py:124). */
  def cartridges(walk: DataFrame): DataFrame = {
    val s = suppliesTable(walk).alias("s")
    val c = colorantTable(walk).alias("c")
    val joined = s
      .where(col("supply_type").isin(TonerTypes: _*))
      .join(c,
        col("s.ip") === col("c.ip") &&
          coalesce(col("s.marker"), lit(1)) === col("c.marker") &&
          coalesce(col("s.colorant_idx"), lit(0)) === col("c.colorant_idx"),
        "left")
      .select(col("s.ip").as("ip"), col("s.rowIdx").as("rowIdx"),
        Normalize.friendlyColor(col("c.colorant_name"), col("s.description"))
          .as("cartridge"),
        Normalize.pctWithSymbol(Normalize.computePercent(
          col("s.unit"), col("s.level"), col("s.max_capacity")))
          .as("remaining_percent"))
    joined
      .groupBy("ip")
      .agg(array_sort(collect_list(struct(
        col("rowIdx"), col("cartridge"), col("remaining_percent"))))
        .as("ordered"))
      .select(col("ip"),
        transform(col("ordered"),
          x => struct(x.getField("cartridge").as("cartridge"),
            x.getField("remaining_percent").as("remaining_percent")))
          .as("cartridges"))
  }
}

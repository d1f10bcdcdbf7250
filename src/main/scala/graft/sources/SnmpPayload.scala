package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** SNMP payload → cartridges: the reference's `get_snmp_toner` pipeline
  * (adapters/snmp_toner.py:90-138) as declarative relational transforms
  * over walk rows `(ip, oid, value)` — SURVEY.md §2 A1 (pivot), J4
  * (colorant join), F9/F10/F11/F12/F13 (percent/format/color/text/OID).
  *
  * Faithful layout (snmp_toner.py:6-14):
  *  - supplies OID = …43.11.1.1.{col}.{dev}.{rowIdx} — col at marker+4,
  *    rowIdx at marker+6 (:36-45); columns 2=marker-idx 3=colorant-idx
  *    5=type 6=description 7=unit 8=max 9=level are table VALUES,
  *    including the row's marker/colorant link;
  *  - colorant OID = …43.12.1.1.4.{dev}.{marker}.{color} with dev
  *    required to be "1" (:47-59);
  *  - join defaults: marker None-or-0 → 1, colorant None → 0
  *    (`r.get(col) or default`, :128-129);
  *  - toner-type filter ∈ {3,5,6,10,21} (:109-110), rows in ascending
  *    SNMP row order (:124), text fields through `_to_text` (F12).
  *
  * All expressions are built-in (codegen'd); the only shuffles are the
  * two pivot groupBys and the final per-device collect — each keyed by
  * device, so at fleet scale the plan is embarrassingly parallel with
  * map-side partial aggregation.
  */
object SnmpPayload {

  val SuppliesBase = "1.3.6.1.2.1.43.11.1.1"
  val ColorantBase = "1.3.6.1.2.1.43.12.1.1.4"

  /** Toner-ish supply types kept by the reference (snmp_toner.py:13). */
  val TonerTypes: Seq[Int] = Seq(3, 5, 6, 10, 21)

  /** Supplies table: OID triples → one row per (ip, rowIdx) with the
    * reference's column set (A1 pivot; snmp_toner.py:91-105). */
  def suppliesTable(walk: DataFrame): DataFrame = {
    val parts = split(col("oid"), "\\.")
    val i = array_position(parts, lit("43"))
    def p(off: Int): Column = element_at(parts, (i + off).cast("int"))
    walk
      .where(i > 0 && p(1) === "11" && p(2) === "1" && p(3) === "1")
      .select(col("ip"),
        p(4).try_cast("int").as("colId"),
        p(6).try_cast("int").as("rowIdx"),
        col("value"))
      .groupBy("ip", "rowIdx")
      .pivot("colId", Seq(2, 3, 5, 6, 7, 8, 9))
      .agg(first("value"))
      .select(col("ip"), col("rowIdx"),
        col("2").try_cast("int").as("marker_idx"),
        col("3").try_cast("int").as("colorant_idx"),
        col("5").try_cast("int").as("supply_type"),
        Normalize.toText(col("6")).as("description"),
        col("7").try_cast("int").as("unit"),
        col("8").try_cast("long").as("max_capacity"),
        col("9").try_cast("long").as("level"))
  }

  /** Colorant-name table keyed (ip, marker, colorant_idx): value column
    * "4", device sub-index must be "1" (snmp_toner.py:48-59). */
  def colorantTable(walk: DataFrame): DataFrame = {
    val parts = split(col("oid"), "\\.")
    val i = array_position(parts, lit("43"))
    def p(off: Int): Column = element_at(parts, (i + off).cast("int"))
    walk
      .where(i > 0 && p(1) === "12" && p(4) === "4" && p(5) === "1")
      .select(col("ip"),
        p(6).try_cast("int").as("marker"),
        p(7).try_cast("int").as("colorant_idx"),
        Normalize.toText(col("value")).as("colorant_name"))
  }

  /** Full pipeline: type filter → supplies ⋈ colorant (J4 with the
    * reference's `or`-defaults: marker 0/None→1, colorant None→0) →
    * percent (F9/F10) + friendly color (F11) → per-device cartridge
    * array in ascending SNMP row order (W3). */
  def cartridges(walk: DataFrame): DataFrame = {
    val s = suppliesTable(walk).alias("s")
    val c = colorantTable(walk).alias("c")
    // Python `x or default` treats 0 AND None as falsy — marker 0 → 1.
    val markerKey = when(col("s.marker_idx").isNull || col("s.marker_idx") === 0, 1)
      .otherwise(col("s.marker_idx"))
    val joined = s
      .where(col("supply_type").isin(TonerTypes: _*))
      .join(c,
        col("s.ip") === col("c.ip") &&
          markerKey === col("c.marker") &&
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

  // ---- toner-type codes (adapters/toner_type_snmp.py:70-107) ----

  /** `_friendly_color_from_text` (toner_type_snmp.py:41-53) — note the
    * Hebrew aliases differ from snmp_toner's F11 (ציאן/מג here vs
    * כחול/אדום there); no fallback, null when nothing matches. */
  def tonerColorFromText(c: Column): Column = {
    val t = lower(coalesce(c, lit("")))
    when(t === "", lit(null).cast("string"))
      .when(t.contains("black") || t.contains("שחור"), "Black")
      .when(t.contains("cyan") || t.contains("ציאן"), "Cyan")
      .when(t.contains("magenta") || t.contains("מג"), "Magenta")
      .when(t.contains("yellow") || t.contains("צהוב"), "Yellow")
      .otherwise(lit(null).cast("string"))
  }

  /** `_extract_code` (toner_type_snmp.py:55-67): parenthesized token
    * wins; else the token after a case-insensitive "HP" unless it is
    * exactly ddDV (case-sensitive reject → falls through); else the
    * LAST generic token of the UPPERCASED text. */
  def extractTonerCode(desc: Column): Column = {
    val paren = regexp_extract(desc, "\\(([A-Z0-9\\-]{3,})\\)", 1)
    val hp = regexp_extract(desc, "(?i)\\bHP\\b\\W*([A-Z0-9\\-]{3,})", 1)
    val gens = regexp_extract_all(upper(desc),
      lit("\\b([A-Z][A-Z0-9\\-]{2,})\\b"), lit(1))
    val genLast = when(size(gens) > 0, get(gens, size(gens) - 1))
    when(length(paren) > 0, paren)
      .when(length(hp) > 0 && !hp.rlike("^\\d{3}V$"), hp)
      .otherwise(genLast)
  }

  /** A8 — `get_snmp_toner_types` tail (toner_type_snmp.py:85-107):
    * toner-typed rows whose desc mentions "hp", (color, code) pairs
    * deduped, sorted by fixed color rank then code; one codes list per
    * device. Input: suppliesTable-shaped rows. */
  def tonerTypeCodes(supplies: DataFrame, keyCol: String = "ip"): DataFrame = {
    val colorRank = Map("Black" -> 0, "Cyan" -> 1, "Magenta" -> 2, "Yellow" -> 3)
    val desc = coalesce(col("description"), lit(""))
    val color = tonerColorFromText(desc)
    val code = extractTonerCode(desc)
    supplies
      .where(col("supply_type").isin(TonerTypes: _*) &&
        length(desc) > 0 && lower(desc).contains("hp"))
      .select(col(keyCol), color.as("color"), code.as("code"))
      .where(col("color").isNotNull && col("code").isNotNull)
      .distinct()
      .withColumn("color_rank",
        coalesce(element_at(typedLit(colorRank), col("color")), lit(99)))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(
        col("color_rank"), col("code")))).as("pairs"))
      .select(col(keyCol),
        transform(col("pairs"), p => p.getField("code")).as("codes"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** Document-level enrichment joins (SURVEY.md §2.3 J1/J2, W1).
  *
  * Both side tables are tiny relative to the fleet — always broadcast;
  * the printers side never shuffles. Order-sensitive merge semantics
  * (last-wins, first-seen) are pinned to explicit row indexes
  * (SURVEY.md §4.3) — bare first()/last() without order is a bug class
  * these helpers exist to prevent.
  */
object Enrich {

  import org.apache.spark.sql.types.{StringType, StructType}

  /** `ensure_printer_info`-style on-demand struct creation
    * (core/printers.py:19-24 analogue for storeInfo): withField on a
    * NULL struct returns null, so enrichment coalesces to an all-null
    * struct of the document's storeInfo schema first. */
  private def siBase(df: DataFrame): Column =
    df.schema.fields.find(_.name == "storeInfo").map(_.dataType) match {
      case Some(t: StructType) =>
        coalesce(col("storeInfo"),
          struct(t.fields.toSeq.map(f => lit(null).cast(f.dataType).as(f.name)): _*))
      case _ =>
        val descT = "struct<LineID:string,PrimaryDescription:string,SecondayDescription:string>"
        struct(lit(null).cast(StringType).as("Manager"),
          lit(null).cast(StringType).as("Phone"),
          lit(null).cast(StringType).as("Location"),
          lit(null).cast(StringType).as("Postal"),
          lit(null).cast(descT).as("firstDescription"),
          lit(null).cast(descT).as("secondDescription"))
    }

  /** J1 — employees → branches (core/enrich/employees.py:4-34):
    * left-join on trimmed id; NON-EMPTY-WINS update of
    * storeInfo.Manager/Phone (an empty employee cell never clobbers an
    * existing value, :26-29); `changed` column supports the run
    * summary's changed-row count. Expects `employees(id, name, phone)`
    * (SideTables.employees shape). */
  def employees(printers: DataFrame, employees: DataFrame): DataFrame = {
    // build_employees_index is a dict — duplicate ids collapse with the
    // LAST row winning (employees.py:4-5); a plain join would instead
    // fan out printer rows. Last-wins needs source order: use row_idx
    // when the caller carries one, else pin determinism by value order.
    val keyed = employees.select(trim(col("id")).as("emp_id"),
      struct(col("name"), col("phone")).as("np"),
      (if (employees.columns.contains("row_idx")) col("row_idx")
       else struct(col("name"), col("phone"))).as("ord"))
    val emp = broadcast(keyed
      .groupBy("emp_id")
      .agg(max_by(col("np"), col("ord")).as("v"))
      .select(col("emp_id"), col("v.name").as("emp_name"),
        col("v.phone").as("emp_phone")))
    val isBranch = col("group") === "Branches_Grouped"
    def nonEmptyWins(newV: Column, oldV: Column): Column =
      when(length(trim(coalesce(newV, lit("")))) > 0, newV).otherwise(oldV)
    val joined = printers.join(emp,
      isBranch && trim(col("ID").cast("string")) === col("emp_id"), "left")
    val si = siBase(printers)
    val newManager = nonEmptyWins(col("emp_name"), si.getField("Manager"))
    val newPhone = nonEmptyWins(col("emp_phone"), si.getField("Phone"))
    joined
      .withColumn("changed",
        col("emp_id").isNotNull &&
          (!(newManager <=> si.getField("Manager")) ||
           !(newPhone <=> si.getField("Phone"))))
      .withColumn("storeInfo",
        when(col("emp_id").isNotNull,
          si.withField("Manager", newManager).withField("Phone", newPhone))
          .otherwise(si))
      .drop("emp_id", "emp_name", "emp_phone")
  }

  /** Branch ids are canonicalized NUMERICALLY on both sides
    * (`_safe_int`, locations.py:51,61,82 — "105.0" and "105" are the
    * same branch); non-numeric ids drop out like the reference's
    * `continue`. */
  private def bidOf(c: Column): Column = Normalize.safeInt(c)

  /** J2 sub-op (a) — last-wins branch→address map over an ordered input
    * (core/enrich/locations.py:47-56): max_by on the explicit row
    * index, NOT last() (distributed order is undefined). Input:
    * `locations(branch_id, address, primary_desc, secondary_desc,
    * subscriber)` + `row_idx`. */
  def addressMap(locations: DataFrame): DataFrame =
    locations
      .where(bidOf(col("branch_id")).isNotNull &&
        length(trim(coalesce(col("address"), lit("")))) > 0)
      .groupBy(bidOf(col("branch_id")).as("bid"))
      .agg(max_by(trim(col("address")), col("row_idx")).as("address"))

  /** `_norm_text` (locations.py:19-25): strip + whitespace-collapse,
    * null when nothing remains (no lowercasing, unlike F1). */
  private def normText(c: Column): Column = {
    val s = regexp_replace(trim(c.cast("string")), "\\s+", " ")
    when(s =!= "", s)
  }

  /** J2 sub-op (b) — per-branch first-seen-ordered distinct
    * (primary, secondary) pairs, each carrying the normalized non-null
    * subscriber list in row order; ranks 1–2 kept (locations.py:57-78 +
    * W1). Texts go through `_norm_text` — blank-after-strip halves are
    * None, rows where BOTH are None are skipped, a single None half
    * coerces to "" for pair identity (:66-70). */
  def rankedPairs(locations: DataFrame): DataFrame = {
    val pairs = locations
      .where(bidOf(col("branch_id")).isNotNull &&
        (normText(col("primary_desc")).isNotNull ||
          normText(col("secondary_desc")).isNotNull))
      .groupBy(bidOf(col("branch_id")).as("bid"),
        coalesce(normText(col("primary_desc")), lit("")).as("primary_desc"),
        coalesce(normText(col("secondary_desc")), lit("")).as("secondary_desc"))
      .agg(min("row_idx").as("first_seen"),
        array_sort(collect_list(when(normText(col("subscriber")).isNotNull,
          struct(col("row_idx"), normText(col("subscriber")).as("subscriber")))))
          .as("subs0"))
      .withColumn("subscribers",
        transform(col("subs0"), s => s.getField("subscriber")))
      .drop("subs0")
    val w = Window.partitionBy("bid").orderBy("first_seen")
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= 2)
  }

  /** J2 — full locations → branches enrich (locations.py:79-109):
    * address (postal split, F7) + pair #1/#2 as
    * firstDescription/secondDescription with LineID = first subscriber.
    */
  def locations(printers: DataFrame, locs: DataFrame): DataFrame = {
    val addr = addressMap(locs)
    val pairs = rankedPairs(locs)
    def descStruct(rank: Int): Column =
      max_by(when(col("rank") === rank, struct(
        // missing subscriber → "" (locations.py:98: nums[0] if nums else "")
        coalesce(get(col("subscribers"), lit(0)), lit("")).as("LineID"),
        col("primary_desc").as("PrimaryDescription"),
        // (sic) the typo is part of the reference schema,
        // core/enrich/locations.py:95-103
        col("secondary_desc").as("SecondayDescription"))),
        when(col("rank") === rank, lit(1)).otherwise(lit(0)))
    val perBranch = pairs.groupBy("bid")
      .agg(descStruct(1).as("firstDescription"), descStruct(2).as("secondDescription"))
      .join(addr, Seq("bid"), "full")
    val (postal, cleanAddr) = Normalize.splitPostal(col("b_address"))
    val side = broadcast(perBranch
      .select(col("bid"), col("address").as("b_address"),
        col("firstDescription").as("b_first"), col("secondDescription").as("b_second"))
      .withColumn("b_postal", postal)
      .withColumn("b_location", cleanAddr))
    val isBranch = col("group") === "Branches_Grouped"
    val joined = printers.join(side,
      isBranch && bidOf(col("ID")) === col("bid"), "left")
    val si = siBase(printers)
    joined
      .withColumn("storeInfo",
        when(col("bid").isNotNull, si
          // Location/Postal are (over)written together iff an address
          // exists — Postal may be set to NULL then (locations.py:88-92)
          .withField("Location",
            when(col("b_address").isNotNull, col("b_location"))
              .otherwise(si.getField("Location")))
          .withField("Postal",
            when(col("b_address").isNotNull, col("b_postal"))
              .otherwise(si.getField("Postal")))
          .withField("firstDescription",
            coalesce(col("b_first"), si.getField("firstDescription")))
          .withField("secondDescription",
            coalesce(col("b_second"), si.getField("secondDescription"))))
          .otherwise(si))
      .drop("bid", "b_address", "b_first", "b_second", "b_postal", "b_location")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable AS-OF join: for each left row, the latest right row of the
  * same key with `rightTs <= leftTs` (point-in-time enrichment —
  * "state as of the event").
  *
  * The naive formulations both die at scale: a range-predicate join
  * explodes into a per-key cross product, and a per-left-row subquery
  * is quadratic. The scalable shape is the union + sorted
  * carry-forward: tag both sides, union them, and in ONE partitioned
  * window pass carry the last right payload forward onto each left
  * row. Two keyed shuffles total — the (key, ts) tie-dedupe with
  * map-side partial agg, then the per-key window; running memory per
  * task is a single payload struct, independent of key cardinality
  * and time range.
  *
  * Determinism: right rows tied on (key, ts) are first reduced to one
  * by greatest payload struct (field-order comparison — callers put a
  * unique id first); at equal left/right timestamps the right row
  * sorts FIRST, so `rightTs == leftTs` matches (ASOF's `<=`
  * convention, DuckDB-compatible).
  */
object AsOfJoin {

  /** Left-join `left` to the as-of-latest `right` row per `keys`.
    * `payload` columns from the right side come back prefixed; a left
    * row with no prior right row gets nulls. Both ts columns must be
    * the same orderable type. SQL join semantics on NULL keys: a
    * null-keyed left row matches nothing (never another null). NULL
    * timestamps follow ASOF's `r.ts <= l.ts` predicate: a right row
    * with NULL `rightTs` never matches (dropped up front — otherwise
    * the nulls-first window order would carry its payload onto every
    * left row of its key), and a left row with NULL `leftTs` matches
    * nothing (it sorts before every non-null right row, so the
    * carry-forward is null there). Column names starting with `__`
    * are reserved for the op's bookkeeping. */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(!(left.columns ++ right.columns).exists(_.startsWith("__")),
      "column names starting with __ are reserved by AsOfJoin")
    val keyCols: Seq[Column] = keys.map(col)
    // one right row per (key, ts): greatest payload struct wins.
    // NULL-keyed right rows are dropped up front — the window's
    // partitionBy would otherwise group NULLs together and match them
    // to null-keyed left rows, which SQL (and the oracle) never does.
    // (With no keys at all the join is a global carry-forward and
    // there is nothing to null-screen.)
    // NULL-ts right rows are likewise unmatched under `<=`; screen them
    // with the keys so they can't win the nulls-first carry-forward.
    val rightNonNull =
      (if (keys.isEmpty) right
       else right.filter(keys.map(col(_).isNotNull).reduce(_ && _)))
        .filter(col(rightTs).isNotNull)
    val rightOne = rightNonNull
      .groupBy(keyCols :+ col(rightTs).as("__ts"): _*)
      .agg(max(struct(payload.map(col): _*)).as("__p"))
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__p", lit(null).cast(rightOne.schema("__p").dataType))
      .withColumn("__side", lit(1))
    val rightTagged = rightOne.withColumn("__side", lit(0))
      .select(leftTagged.columns.filter(c =>
        keys.contains(c) || c.startsWith("__")).map(col): _*)
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    // right (side 0) sorts before left (side 1) at equal ts → <= match
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payload.foldLeft(carried) { (df, p) =>
      df.withColumn(prefix + p, col("__last").getField(p))
    }.drop("__ts", "__p", "__side", "__last")
  }
}

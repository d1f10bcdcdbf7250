package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructType}

/** Scalable global row numbering (SURVEY.md §4.3 / the 100 TB
  * checklist).
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses
  * the whole dataset into ONE task (Spark warns "No Partition Defined
  * for Window operation") — fine on 60k rows, fatal on 100 TB. The
  * scalable equivalent is the classic two-phase rank:
  *
  *  1. range-partition by the sort keys + sort within partitions
  *     (a distributed sort — exactly what `orderBy` lowers to);
  *  2. assign each row `partitionOffset + localIndex`, where the
  *     offsets are the cumulative per-partition counts.
  *
  * Phase 2 is `RDD.zipWithIndex`: one tiny job to count partitions
  * (driver holds one Long per partition, never row data), then a
  * per-partition imperative pass — the rare case where the RDD seam is
  * the right tool, since no Catalyst operator exposes partition-offset
  * arithmetic. Output values are IDENTICAL to the single-partition
  * window when the sort key is total (caller must include a tiebreaker
  * column; otherwise ranks among ties are partition-order-dependent,
  * same as the window form).
  */
object GlobalRank {

  /** Append `rankCol` (1-based Long, dense sequential) ordering by
    * `keys`. The rows COME OUT physically sorted by `keys` (≡ by
    * `rankCol`), but the RDD seam erases that fact from Catalyst — a
    * downstream `orderBy(rankCol)` plans a fresh range-shuffle sort,
    * so skip it unless the consumer genuinely needs a declared
    * ordering (e.g. a driver-gated deterministic dump). */
  def withGlobalRowNumber(df: DataFrame, rankCol: String, keys: Column*): DataFrame =
    withGlobalRowNumber(df, rankCol, None, keys)

  /** As above with an explicit range-partition count; `None` lets AQE
    * size the shuffle (it will coalesce demo-scale inputs to one
    * partition — the offsets logic is the same either way). */
  def withGlobalRowNumber(df: DataFrame, rankCol: String,
      numPartitions: Option[Int], keys: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    // Distributed sort: range partition + local sort (what orderBy
    // plans to), NOT coalesce(1)/Window-over-nothing.
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, keys: _*)
      case None => df.repartitionByRange(keys: _*)
    }
    val sorted = ranged.sortWithinPartitions(keys: _*)
    val schema = sorted.schema
    val out: StructType = schema.add(rankCol, LongType, nullable = false)
    val indexed: RDD[Row] = sorted.rdd.zipWithIndex().map {
      case (row, i) => Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, out)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (SURVEY.md §4.3 / the 100 TB checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that
  * even split shuffle blocks overwhelm a task, or when AQE is off
  * (streaming joins). Shape:
  *
  *  - BIG side: deterministic salt in [0, buckets) derived by hashing
  *    the row's OTHER columns (never random — retries must be
  *    idempotent, SURVEY.md §4.3 determinism rule);
  *  - SMALL side: exploded ×buckets (each row replicated per salt);
  *  - join on (key, salt) → the dominant key's rows spread over
  *    `buckets` tasks instead of one.
  *
  * Output equals the plain join exactly (spec-verified); only the
  * partitioning changes.
  */
object SaltedJoin {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key over
    * `buckets` shuffle partitions. `spreadCols` feed the deterministic
    * salt hash (default: all non-key columns of the big side). */
  def apply(big: DataFrame, small: DataFrame, key: String, buckets: Int,
      joinType: String = "inner", spreadCols: Seq[String] = Seq.empty): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spread: Seq[Column] =
      (if (spreadCols.nonEmpty) spreadCols
       else big.columns.filterNot(_ == key).toSeq) match {
        case Seq() => Seq(monotonically_increasing_id())
        case cs => cs.map(c => col(s"`$c`"))
      }
    val salted = big.withColumn("_salt", pmod(hash(spread: _*), lit(buckets)))
    val expanded = small
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    val out = salted.join(expanded,
      salted(key) === expanded(key) && salted("_salt") === expanded("_salt"),
      joinType)
    // drop the duplicate key + salt bookkeeping, keep big-side key
    out.drop(expanded(key)).drop(salted("_salt")).drop(expanded("_salt"))
  }
}

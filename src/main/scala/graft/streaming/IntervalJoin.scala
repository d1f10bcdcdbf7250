package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream event-time INTERVAL join — the attribution shape: a
  * purchase matches the same user's clicks from the preceding
  * `horizon` (c_ts ∈ [p_ts − horizon, p_ts]).
  *
  * This is the streaming counterpart of the batch as-of/attribution
  * family (j7): in a stream neither side can be "the lookup table", so
  * Spark buffers BOTH sides in the state store — and the scale story
  * is what bounds that buffer. The watermark on each side plus the
  * range condition let the engine drop a buffered row as soon as the
  * other side's watermark passes its last possible match (p_ts older
  * than watermark; c_ts older than watermark − horizon), so state is
  * ingest-rate × (delay + horizon), never history-sized. An interval
  * join WITHOUT the time bound would buffer forever — Spark rejects
  * it in Append mode for exactly that reason.
  */
object IntervalJoin {

  /** Inner-join purchases (p_id, p_user, p_ts, …) with clicks
    * (c_id, c_user, c_ts, …): same user, click at-or-before the
    * purchase, at most `horizon` older. `delay` is each side's
    * watermark delay. Event-time columns must be TIMESTAMP (the
    * watermark rides them). */
  def attribute(purchases: DataFrame, clicks: DataFrame,
      delay: String, horizon: String): DataFrame =
    joined(purchases, clicks, delay, horizon, "inner")

  /** Left-outer variant: purchases with NO in-horizon click still come
    * out (null click columns) — but only once the click-side watermark
    * has passed their last possible match, since until then a late
    * click could still arrive. Unmatched rows therefore trail the
    * watermark delay; that latency is the price of a correct outer
    * result on streams, not a bug. */
  def attributeLeftOuter(purchases: DataFrame, clicks: DataFrame,
      delay: String, horizon: String): DataFrame =
    joined(purchases, clicks, delay, horizon, "left_outer")

  /** The one attribution predicate both the streaming and batch twins
    * join on: same user, click at-or-before the purchase, at most
    * `horizon` older. Factored so the two executions cannot drift. */
  private def condition(horizon: Column): Column =
    col("p_user") === col("c_user") &&
      col("c_ts") <= col("p_ts") &&
      col("c_ts") >= col("p_ts") - horizon

  /** Batch twin of [[attributeLeftOuter]] over µs-epoch longs — the
    * SAME predicate with the horizon as a µs literal, no watermark
    * (batch needs no state bound: the equi-key on user drives a
    * sort-merge join and the range rides along as its condition, so
    * there is no per-key cross product). This is what the `j8` driver
    * gate runs, making batch/oracle parity driver-checked — the spec
    * separately pins streaming == batch on the same shape. */
  def attributeBatchLeftOuter(purchases: DataFrame, clicks: DataFrame,
      horizonUs: Long): DataFrame =
    purchases.join(clicks, condition(lit(horizonUs)), "left_outer")

  private def joined(purchases: DataFrame, clicks: DataFrame,
      delay: String, horizon: String, joinType: String): DataFrame = {
    val p = purchases.withWatermark("p_ts", delay)
    val c = clicks.withWatermark("c_ts", delay)
    p.join(c, condition(expr(s"INTERVAL $horizon")), joinType)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._

/** DSIR frozen-model SERVE path: t71 trains the hashed-bucket models
  * over the corpus (a 64-row aggregate); a production ingest then
  * scores every arriving document against the FROZEN model — the
  * train-batch / serve-anywhere split the two-level k-means tier uses
  * (t65's broadcast-model E-step). The model here is literal-sized
  * (2 × [[graft.functions.TextAnalysis.DsirBuckets]] longs + two
  * totals), so serving embeds it as map literals in the projection:
  * ZERO joins, zero shuffles, zero state — the score is a row-local
  * fold over the token array, which also makes it directly usable as
  * a stateless STREAMING projection (DsirServeSpec pins both the
  * batch score parity against the t71 gate and the streaming run).
  *
  * All arithmetic is t71's exact whole-bit surprisal over the SHARED
  * [[graft.functions.TextAnalysis.dsirBucket]]/`bitlen` definitions —
  * a served score can never drift from the gate's. */
object DsirServe {

  /** The frozen model: per-bucket target/raw counts + totals.
    * Buckets absent from a map count 0 (smoothing handles them). */
  final case class DsirModel(ct: Map[Long, Long], cr: Map[Long, Long],
      tT: Long, tR: Long)

  /** Train = t71's model build: one instance-stream pass, two 64-row
    * aggregates collected driver-side (model-sized by construction —
    * the KMeans-centroid convention). `targetPred` restricts the
    * target slice as a scan filter on the instance stream. */
  def train(docs: DataFrame, targetPred: Column): DsirModel = {
    val inst = docs
      .select(targetPred.as("is_t"), explode(tokens(col("text"))).as("tok"))
      .select(col("is_t"), dsirBucket(col("tok")).as("bucket"))
    val rows = inst.groupBy("bucket").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"),
      count(lit(1)).as("c_r")).collect()
    val ct = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cr = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    DsirModel(ct, cr, ct.values.sum, cr.values.sum)
  }

  /** Score a (batch or streaming) docs frame: appends `n_toks` and
    * `logw_bits` — bit-identical to the t71 gate's columns for a
    * model trained on the same corpus. Pure projection: the maps are
    * literals, the fold is row-local. */
  def score(docs: DataFrame, m: DsirModel): DataFrame = {
    val ctMap = typedLit(m.ct)
    val crMap = typedLit(m.cr)
    // the per-token constant log(T_r + B) - log(T_t + B), whole-bit,
    // folded driver-side (model constants, not data)
    val constBits =
      java.lang.Long.toBinaryString(m.tR + DsirBuckets).length.toLong -
        java.lang.Long.toBinaryString(m.tT + DsirBuckets).length.toLong
    val buckets = transform(tokens(col("text")), dsirBucket(_))
    val perTok = (b: Column) =>
      bitlen(coalesce(element_at(ctMap, b), lit(0L)) + 1) -
        bitlen(coalesce(element_at(crMap, b), lit(0L)) + 1)
    docs
      .withColumn("n_toks", size(buckets).cast("long"))
      .withColumn("logw_bits",
        aggregate(buckets, lit(0L), (acc, b) => acc + perTok(b)) +
          col("n_toks") * constBits)
  }
}

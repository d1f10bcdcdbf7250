package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Streaming-ingest curation: the T1 exact-dedup rule applied as
  * documents ARRIVE instead of in a batch sweep — the shape a 100 TB
  * crawl pipeline actually runs (dedup at the door, periodic batch
  * dedup as the backstop).
  *
  * State discipline is the scale story: `dropDuplicatesWithinWatermark`
  * keeps a content-hash key in the state store only until the watermark
  * passes it, so state size is bounded by the ingest-rate × delay
  * window, not by corpus history. A re-crawl of the same content inside
  * the window is dropped here; one arriving after the window falls
  * through to the periodic batch `t1_exact_dedup` — the standard
  * two-tier contract.
  */
object CurationStream {

  /** Canonical content hash + watermark-bounded streaming dedup.
    * `tsCol` is the arrival/event-time column the watermark rides on;
    * first arrival inside the window wins (later equal-hash rows are
    * dropped). */
  def dedupe(docs: DataFrame, tsCol: String, delay: String): DataFrame =
    docs
      .withColumn("content_hash", md5(TextAnalysis.normText(col("text"))))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** The per-document curation verdict + deterministic split as a
    * STATELESS streaming projection — t19's exact semantics with the
    * repetition term computed IN-ROW (1 − distinct/total trigram
    * shingles on the per-doc array — the same value the batch per-doc
    * groupBy produces, since both count distinct vs total shingles of
    * one document) plus t15's id-hash split. No shuffle, no state
    * store: every verdict column is a function of the arriving row, so
    * this leg of the streaming curation tier costs a projection per
    * micro-batch. Documents too short to shingle (< 3 tokens) are
    * dropped, mirroring t19's inner join against the repetition frame.
    * `StreamingCurationE2ESpec` pins row parity against the batch
    * operators and the finalized manifest against `t28b`. */
  def verdictSplit(docs: DataFrame): DataFrame = {
    import graft.functions.TextAnalysis._
    val toks = tokens(col("text"))
    val stopRatio = stopwordCount(toks).cast("double") / size(toks)
    val punctRatio =
      length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("double") /
        length(col("text"))
    val predicted = when(stopRatio >= 0.05, "en").otherwise("und")
    val quality = least(lit(1.0), size(toks).cast("double") / 100) *
      when(stopRatio >= 0.01 && stopRatio <= 0.3, 1.0).otherwise(0.5) *
      when(punctRatio <= 0.2, 1.0).otherwise(0.5)
    val b = idHashByte(col("doc_id"))
    docs
      .withColumn("__sh", shingles(toks, 3))
      .filter(size(col("__sh")) > 0)
      .withColumn("dup_frac", lit(1.0) -
        size(array_distinct(col("__sh"))).cast("double") / size(col("__sh")))
      .select(col("doc_id"),
        predicted.as("predicted"), quality.as("quality"), col("dup_frac"),
        (predicted === "en" && quality >= 0.5 && col("dup_frac") < 0.3)
          .as("keep"),
        when(predicted =!= "en", "lang")
          .when(quality < 0.5, "quality")
          .when(col("dup_frac") >= 0.3, "repetition").as("drop_reason"),
        when(b < 205, "train").when(b < 230, "val").otherwise("test")
          .as("split"))
  }
}

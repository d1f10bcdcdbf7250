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
    // every rule column comes from the SHARED TextAnalysis definitions
    // (predictedLang/qualityOf/curationKeep/curationDropReason/splitOf)
    // — the batch t19/t15 gates compile the same expressions, so the
    // streaming leg cannot drift from them (the r13 ADVICE deferral,
    // now closed structurally rather than pinned only by the e2e spec)
    docs
      .withColumn("__sh", shingles(tokens(col("text")), 3))
      .filter(size(col("__sh")) > 0)
      .withColumn("dup_frac", lit(1.0) -
        size(array_distinct(col("__sh"))).cast("double") / size(col("__sh")))
      .withColumn("predicted", predictedLang(col("text")))
      .withColumn("quality", qualityOf(col("text")))
      .select(col("doc_id"),
        col("predicted"), col("quality"), col("dup_frac"),
        curationKeep(col("predicted"), col("quality"), col("dup_frac"))
          .as("keep"),
        curationDropReason(col("predicted"), col("quality"), col("dup_frac"))
          .as("drop_reason"),
        splitOf(col("doc_id")).as("split"))
  }
}

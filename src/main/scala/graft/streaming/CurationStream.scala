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
}

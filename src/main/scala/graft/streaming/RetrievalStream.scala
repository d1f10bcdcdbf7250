package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import graft.queries.SearchQueries

/** The RETRIEVAL DOOR (VERDICT r17 item 4): the BM25/RRF family's
  * incremental ingest path. The postings build is the naturally
  * incremental half of lexical retrieval — a document's term counts
  * are a pure function of its own text, so each micro-batch's counts
  * are FINAL deltas appended to a standing postings table (no
  * cross-batch merge state); the corpus-global quantities (df, n_docs,
  * avgdl, the df-ranked query terms) are computed at PUBLISH time over
  * the accumulated tables, exactly like the scorecard door's HLL
  * registers. Both finalize tails are the batch gates' OWN
  * compositions ([[SearchQueries.t53TailOf]]/[[SearchQueries.t80TailOf]]
  * over [[SearchQueries.bm25CoreOfParts]], the scoring expression
  * trees byte-shared with t53/t80), so the published rankings cannot
  * drift between the tiers — StreamingRetrievalSpec pins row-for-row
  * parity with BOTH batch gates over the same corpus.
  *
  * Usage shape (the foreachBatch door — deltas are per-batch
  * AGGREGATES, which an Append-mode sink cannot express without
  * watermark state the door doesn't need):
  * {{{
  * stream.writeStream.trigger(Trigger.AvailableNow()).foreachBatch {
  *   (b, id) =>
  *     RetrievalStream.writePostingsDelta(b, id, p)
  *     RetrievalStream.writeDocLengthDelta(b, id, q)
  * }.start()
  * }}}
  *
  * EXACTLY-ONCE CONTRACT (ADVICE r18): foreachBatch is AT-LEAST-ONCE —
  * a micro-batch that fails after a partial write is REPLAYED with the
  * same batchId, and a plain `mode("append")` would re-append its
  * deltas, silently inflating tf/df/n_docs/avgdl. The write helpers
  * therefore partition every delta by the foreachBatch `batchId` and
  * write with DYNAMIC partition overwrite: a replayed batch replaces
  * exactly its own `batch_id=` partition (same inputs → same deltas,
  * so the replay is a byte-identical overwrite), and the standing
  * tables stay correct under any number of retries.
  * StreamingRetrievalSpec replays every batch's write and pins parity.
  *
  * At lake scale the standing postings table is written bucketed by
  * `word` (the BucketedTables standing-index contract t38's band index
  * demonstrates), so every publish-time df aggregate and term probe
  * reads it shuffle-free. */
object RetrievalStream {

  /** Per-batch postings delta (doc_id, dl, word, tf) — exact final
    * counts for every document in the batch. */
  def postingsDelta(docs: DataFrame): DataFrame =
    SearchQueries.tokenCountsOf(docs)

  /** Per-batch document-length delta (doc_id, dl). Separate from the
    * postings half: a zero-token document counts in n_docs/avgdl but
    * emits no posting row. */
  def docLengthDelta(docs: DataFrame): DataFrame =
    SearchQueries.docLengthsOf(docs)

  /** Replay-safe delta write: the delta lands in its own
    * `batch_id=<id>` partition via dynamic partition overwrite, so a
    * foreachBatch retry (at-least-once delivery) REPLACES its prior
    * partial write instead of appending a duplicate — the idempotence
    * the scaladoc contract above requires. */
  private def writeDelta(delta: DataFrame, batchId: Long,
      path: String): Unit =
    delta.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** foreachBatch door, postings half: idempotent per-batch write. */
  def writePostingsDelta(docs: DataFrame, batchId: Long,
      path: String): Unit =
    writeDelta(postingsDelta(docs), batchId, path)

  /** foreachBatch door, doc-length half: idempotent per-batch write. */
  def writeDocLengthDelta(docs: DataFrame, batchId: Long,
      path: String): Unit =
    writeDelta(docLengthDelta(docs), batchId, path)

  /** A standing delta table as the finalize tails consume it (the
    * `batch_id` bookkeeping partition column dropped). */
  def standing(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch_id")

  /** Publish-time finalize, BM25 leg: t53's own ranked-retrieval tail
    * over the standing tables. */
  def finalizeBm25(dlen: DataFrame, tc: DataFrame): DataFrame =
    SearchQueries.t53TailOf(SearchQueries.bm25CoreOfParts(dlen, tc))

  /** Publish-time finalize, fusion leg: t80's own RRF composition
    * (both scorers off the same standing postings). */
  def finalizeRrf(dlen: DataFrame, tc: DataFrame): DataFrame =
    SearchQueries.t80TailOf(SearchQueries.bm25CoreOfParts(dlen, tc))
}

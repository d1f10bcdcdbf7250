package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.VectorQueries

/** The ANN-SERVE DOOR (VERDICT r18 item 7): query vectors arriving as
  * a stream, answered against the STANDING t82 k-NN graph. Like the
  * DSIR door, this is the frozen-model pattern — the graph, corpus
  * vectors, and entry points are fixed at publish time, so each
  * micro-batch is a STATELESS projection: no cross-batch state, no
  * watermark, no output-mode subtlety. The walk itself is the batch
  * gate's OWN recurrence ([[VectorQueries.knnServeVecs]] — the exact
  * code t83 gates), so streamed answers cannot drift from batch ones:
  * StreamingKnnServeSpec pins row-for-row parity with t83 over the
  * same query set split across micro-batches.
  *
  * Usage shape (foreachBatch, like the retrieval door — the serve
  * recurrence is an iterative multi-join, not a single-pass streaming
  * plan):
  * {{{
  * queryStream.writeStream.trigger(Trigger.AvailableNow())
  *   .foreachBatch { (b, _) =>
  *     KnnServeStream.serveBatch(b, e, edges, entries)
  *       .write.mode("append").parquet(out)
  *   }.start()
  * }}}
  *
  * Footprint: each batch's walk state (per-round beams, query frame)
  * is checkpointed-and-released inside the call (`materialize` —
  * the ADVICE r18 discipline), so a long-running stream holds only
  * the standing graph, never per-batch leftovers. Per-batch cost is
  * O(|batch|·rounds·beam·k) — corpus-independent, the graph-serve
  * property the door exists to expose. */
object KnnServeStream {

  /** Serve one micro-batch of (vec_id, embedding) query rows against
    * the standing graph. `e` is the corpus in embScaled shape
    * (vec_id, eL, ss; plus `embedding` when `route = true`), `edges`
    * the standing (qid, nid) graph, `entries` the fixed entry points
    * as a single `nid` column. `route = true` adds per-query LSH
    * entries ([[VectorQueries.annLshEntries]] at (routeBits,
    * routeTables) — the t85 composition) to each batch's round-0
    * beam: REQUIRED on clustered corpora, where the fixed-entry walk
    * measures recall 0.000 at every decade (ServeLadder, COVERAGE
    * r19). `corpusRows` pre-answers the broadcast-regime decision so
    * a long-running stream doesn't run one corpus count job per
    * micro-batch (ADVICE r19) — pass it once at door wiring time.
    * Output is t83's shape: (query_id, rank, nid, cosine). */
  def serveBatch(batch: DataFrame, e: DataFrame, edges: DataFrame,
      entries: DataFrame,
      beam: Int = VectorQueries.ServeBeam,
      rounds: Int = VectorQueries.ServeRounds,
      k: Int = VectorQueries.ServeK,
      route: Boolean = false,
      routeBits: Int = 12, routeTables: Int = 4,
      corpusRows: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val routed =
      if (!route) None
      else Some(VectorQueries.annLshEntries(
        e.select("vec_id", "embedding"),
        batch.select("vec_id", "embedding"),
        routeBits, routeTables, VectorQueries.LshBucketCap,
        VectorQueries.RouteEntries))
    VectorQueries.knnServeVecs(e, edges, VectorQueries.queryVecsOf(batch),
        entries, beam, rounds, k, materialize = true, routed = routed,
        corpusRows = corpusRows)
      .select(col("qid").as("query_id"), col("rank"), col("nid"),
        col("cosine"))
  }
}

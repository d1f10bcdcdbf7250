package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.queries.{Clustering, VectorQueries}

/** The GRAPH-INSERT DOOR: new vectors arriving as a stream, inserted
  * into the STANDING k-NN graph batch by batch — the FreshDiskANN
  * continuous-ingest pattern (Singh et al., arXiv:2105.09613) over
  * t84's gated insert. Unlike the serve door this one is STATEFUL
  * across batches in exactly one place: the standing graph. Each
  * micro-batch runs the batch gate's own composition
  * ([[VectorQueries.graphInsert]] — serve-walk connect + degree-capped
  * back-edge merge, byte-shared with t84) against the CURRENT graph,
  * and the merged result becomes the graph the NEXT batch walks — so a
  * later batch's walk can route THROUGH an earlier batch's inserts,
  * which is the property that makes continuous ingest an index update
  * rather than a rebuild (StreamingKnnInsertSpec pins both: one-batch
  * parity with t84, and cross-batch reachability through a new node).
  *
  * State discipline: the standing graph is one localCheckpoint of
  * k·N + k·|inserted| rows — the smallest frame in the family — and
  * each swap releases the superseded checkpoint (the t81/ADVICE-r14
  * release pattern), so a long-running door holds O(1) graphs. The
  * corpus frame `e` must already contain the new vectors' rows (or be
  * extended alongside — scoring fetches vectors by id for BOTH ends
  * of a back edge once later batches walk through inserted nodes).
  *
  * Order-dependence is inherent and documented: inserts are folded in
  * batch order (batch N's back-edge merge can evict an edge batch N−1
  * added), exactly as a single-writer FreshDiskANN index behaves. */
final class KnnInsertStream(e: DataFrame, initial: DataFrame,
    entries: DataFrame, k: Int = VectorQueries.KnnK) {

  /** The current standing graph (qid, rank, nid, cosine). */
  @volatile private var graph: DataFrame =
    initial.select("qid", "rank", "nid", "cosine").localCheckpoint()

  def standing: DataFrame = graph

  /** Fold one micro-batch of (vec_id, embedding) new vectors into the
    * standing graph; returns the batch's FORWARD lists (the new
    * vectors' own top-k — what a sink would publish per batch). */
  def insertBatch(batch: DataFrame): DataFrame = {
    val newVecs = VectorQueries.queryVecsOf(batch)
    val merged = VectorQueries
      .graphInsert(e, graph, newVecs, entries, k, materialize = true)
    val prev = graph
    graph = merged
    Clustering.release(prev)
    val newIds = batch.select(col("vec_id").as("qid"))
    merged.join(newIds, "qid")
      .select("qid", "rank", "nid", "cosine")
  }
}

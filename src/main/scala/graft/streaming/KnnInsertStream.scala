package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.queries.{Clustering, VectorQueries}

/** The GRAPH-CRUD DOOR: new vectors and deletions arriving as a
  * stream, folded into the STANDING k-NN graph batch by batch — the
  * FreshDiskANN continuous-ingest pattern (Singh et al.,
  * arXiv:2105.09613) over the gated insert (t84) and delete/repair
  * (t86). The door is STATEFUL in exactly three frames: the standing
  * graph, the standing corpus, and the tombstone set. Each micro-batch
  * runs the batch gates' own compositions
  * ([[VectorQueries.graphInsert]] / [[VectorQueries.graphDelete]] —
  * byte-shared with t84/t86) against the CURRENT graph, and the result
  * becomes the graph the NEXT batch walks — so a later batch's walk
  * routes THROUGH an earlier batch's inserts and AROUND an earlier
  * batch's deletes (StreamingKnnInsertSpec pins one-batch parity with
  * t84, cross-batch reachability, the delete-then-repair routing case,
  * and delete-then-REINSERT of the same id — the FreshDiskANN
  * tombstone case).
  *
  * CORPUS OWNERSHIP (VERDICT r19 item 6): the door owns the vector
  * state. Construct it with the corpus the initial graph covers
  * (embScaled shape, `embedding` column included — routing needs the
  * raw vectors); `insertBatch` folds each batch's vectors in itself,
  * so callers never pre-extend the corpus, and back-edge scoring can
  * never silently read a stale vector table. The live corpus is
  * three-piece — the base checkpoint (never rewritten), an `added`
  * checkpoint of inserted rows (O(inserted), re-checkpointed per
  * batch), and a tombstone id set applied as an anti-join — so a
  * batch costs O(|batch| + |added| + |dels|) state work, NOT a full
  * corpus copy; a 100 TB base is folded over, never rewritten.
  *
  * ROUTING (VERDICT r19 item 1): each insert batch's connect walk
  * starts on the new vectors' own LSH islands
  * ([[VectorQueries.annLshEntries]] against the live corpus — t85's
  * router, t84's gate composition). Without it the fixed-entry walk
  * measures recall 0.000 on every clustered decade corpus and inserts
  * connect to the wrong island. `route = false` exists for the spec
  * that isolates graph-statefulness from the router.
  *
  * COUNT HOIST (ADVICE r19): the broadcast-regime decision is made
  * from the door's own arithmetic row tracking (`corpusRows` fed to
  * the walk/delete), not a per-batch corpus count job.
  *
  * Single-writer: batch methods are synchronized — batches fold in
  * call order (batch N's back-edge merge can evict an edge batch N−1
  * added, exactly as a single-writer FreshDiskANN index behaves), and
  * a swap can never release a checkpoint an in-flight fold still
  * reads. Returned frames are materialized (localCheckpoint) so they
  * stay valid after later batches release superseded state. */
final class KnnInsertStream(corpus: DataFrame, initial: DataFrame,
    entries: DataFrame, k: Int = VectorQueries.KnnK,
    route: Boolean = true, routeBits: Int = 12, routeTables: Int = 4) {

  /** The current standing graph (qid, rank, nid, cosine). */
  private var graph: DataFrame =
    initial.select("qid", "rank", "nid", "cosine").localCheckpoint()

  private val base: DataFrame = corpus
    .select("vec_id", "embedding", "eL", "ss").localCheckpoint()
  /** Inserted rows not yet in `base` (same shape). Deletes remove
    * rows physically (the frame is small), so every `added` row is
    * live by construction. */
  private var added: DataFrame = base.limit(0).localCheckpoint()
  /** Tombstoned BASE vec_ids. PERMANENT: a re-insert of a deleted id
    * lives in `added` with its new vector — the base row must stay
    * masked forever, or the stale vector would resurface beside it
    * (the delete-then-reinsert case StreamingKnnInsertSpec pins). */
  private var delsBase: DataFrame =
    base.select("vec_id").limit(0).localCheckpoint()
  /** Arithmetic live-row tracking — the broadcast-regime input. */
  private var nRows: Long = base.count()

  def standing: DataFrame = graph

  /** The live corpus view: (base minus tombstones) ∪ added — lazy,
    * assembled per batch from the three checkpoints. */
  def liveCorpus: DataFrame =
    base.join(delsBase.select(col("vec_id").as("d")),
        col("vec_id") === col("d"), "left_anti")
      .select("vec_id", "embedding", "eL", "ss")
      .unionByName(added)

  /** Live corpus row count (tracked, not recounted). */
  def liveRows: Long = nRows

  /** Fold one micro-batch of (vec_id, embedding) new vectors into the
    * standing graph and corpus; returns the batch's FORWARD lists
    * (the new vectors' own top-k — what a sink would publish),
    * materialized so it outlives later batches' state swaps.
    * Precondition (FreshDiskANN single-writer semantics): a batch id
    * must not currently be live — delete it first to re-insert. */
  def insertBatch(batch: DataFrame): DataFrame = synchronized {
    val b = batch.select("vec_id", "embedding").localCheckpoint()
    val bn = b.count()
    val pre = liveCorpus // routing runs over the PRE-batch view
    // MATERIALIZED before the corpus swap below: the router output
    // references the current `added` checkpoint, which the swap
    // releases — a lazy routed frame would hit a truncated-lineage
    // block-not-found in the walk (surfaced by the ×10 CRUD ladder;
    // the single-batch routed spec cannot, its pre-swap `added` is
    // empty)
    val routed =
      if (!route) None
      else Some(VectorQueries.annLshEntries(
          pre.select("vec_id", "embedding"), b,
          routeBits, routeTables, VectorQueries.LshBucketCap,
          VectorQueries.RouteEntries)
        .localCheckpoint())
    // fold the batch's vectors in: scoring fetches BOTH ends of a back
    // edge by id, and later batches route through these rows
    val scaledB = VectorQueries.embScaledOf(b)
    val prevAdded = added
    added = added.unionByName(scaledB).localCheckpoint()
    Clustering.release(prevAdded)
    nRows += bn
    val newVecs = VectorQueries.queryVecsOf(b)
    val merged = VectorQueries.graphInsert(liveCorpus, graph, newVecs,
      entries, k, materialize = true, routed = routed,
      corpusRows = Some(nRows))
    routed.foreach(Clustering.release) // walk materialized — done with it
    val prev = graph
    graph = merged
    Clustering.release(prev)
    val newIds = b.select(col("vec_id").as("qid"))
    val out = merged.join(newIds, "qid")
      .select("qid", "rank", "nid", "cosine")
      .localCheckpoint() // must outlive the NEXT batch's graph swap
    Clustering.release(b)
    out
  }

  /** Remove a batch of vec_ids from the standing graph (t86's
    * delete/one-hop repair) and the standing corpus; returns the
    * repaired standing graph (also reachable via [[standing]]). */
  def deleteBatch(delIds: DataFrame): DataFrame = synchronized {
    val d = delIds.select("vec_id").localCheckpoint()
    // live ids only: count moves by what actually dies
    val gone = d.join(liveCorpus.select("vec_id"), Seq("vec_id"),
      "left_semi").count()
    // already (qid, rank, nid, cosine) — no projection on top of the
    // checkpoint, so the next swap's release really unpersists it
    val repaired = VectorQueries.graphDelete(liveCorpus, graph, d, k,
      corpusRows = Some(nRows), materialize = true)
    val prevG = graph
    graph = repaired
    Clustering.release(prevG)
    val prevAdded = added
    val prevDels = delsBase
    added = added.join(d.select(col("vec_id").as("d")),
      col("vec_id") === col("d"), "left_anti").localCheckpoint()
    delsBase = delsBase.unionByName(d).distinct().localCheckpoint()
    Clustering.release(prevAdded)
    Clustering.release(prevDels)
    nRows -= gone
    Clustering.release(d)
    graph
  }

  /** One mixed micro-batch: deletes applied first, then inserts — the
    * FreshDiskANN order, which makes delete-then-reinsert of the same
    * id within one batch a repair followed by a fresh connect.
    * Returns the insert arm's forward lists. */
  def crudBatch(inserts: DataFrame, deletes: DataFrame): DataFrame =
    synchronized {
      deleteBatch(deletes)
      insertBatch(inserts)
    }

  /** CONSOLIDATE (FreshDiskANN's StreamingMerge — t88's operator):
    * rebuild the degraded nodes' lists (degree < k after repair-pool-
    * thin deletes or cap evictions) from their live 1/2-hop
    * neighborhoods plus deterministic hash-fill candidates; healthy
    * nodes pass through byte-identical. Run periodically between CRUD
    * batches; cost is |degraded|-proportional. Returns the
    * consolidated standing graph. */
  def consolidate(): DataFrame = synchronized {
    val merged = VectorQueries.graphConsolidate(liveCorpus, graph, k,
      corpusRows = Some(nRows), materialize = true)
    val prev = graph
    graph = merged
    Clustering.release(prev)
    graph
  }
}

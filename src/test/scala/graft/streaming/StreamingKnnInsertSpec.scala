package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries

/** The graph-CRUD door's contracts: (1) a single insert batch folded
  * into the standing graph is EXACTLY the batch gate — t84 row-for-row
  * over the same corpus split, WITHOUT the caller pre-extending the
  * corpus (the door owns the vector state — VERDICT r19 item 6);
  * (2) the door is genuinely stateful — a later batch's serve walk
  * routes THROUGH an earlier batch's inserted node (on a hand graph
  * where that node is the only path to the true neighbor), which a
  * stale-graph insert provably misses; (3) the stale-CORPUS
  * counterfactual: calling the raw op with a corpus that lacks the
  * earlier insert's vector silently drops the inserted node from
  * scoring — the exact failure mode corpus ownership removes;
  * (4) mixed CRUD: a batch-2 insert routes through a batch-1 insert
  * whose own connect walk crossed an edge the batch-1 DELETE's repair
  * created; (5) delete-then-REINSERT of the same id (the FreshDiskANN
  * tombstone case) — the tombstone lifts, the new vector's row
  * replaces the old, and row accounting tracks through. */
class StreamingKnnInsertSpec extends SparkSpec {
  import spark.implicits._

  private def v(flips: Int): Array[Float] =
    Array.tabulate(64)(i => if (i < flips) -1.0f else 1.0f)

  private def scored(emb: org.apache.spark.sql.DataFrame) =
    emb.select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))

  private def fwd(df: org.apache.spark.sql.DataFrame) =
    df.select("rank", "nid").as[(Long, Long)].collect().sorted.toSeq

  test("one-batch door equals the t84 batch gate row-for-row (no pre-extended corpus)") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, sf)
    val e = scored(emb).localCheckpoint()
    val base = e.filter(col("vec_id") >= VectorQueries.InsertNewMax)
    val lsh = VectorQueries.annLshPairs(base, 12, 4,
        VectorQueries.LshBucketCap)
      .select("qid", "nid").localCheckpoint()
    val g = VectorQueries.nnDescentFrom(base,
      lsh.union(VectorQueries.seedFill(base, lsh, VectorQueries.KnnK)),
      VectorQueries.KnnK, VectorQueries.KnnRounds)
    val ents = base.select(col("vec_id").as("nid"))
      .orderBy("nid").limit(VectorQueries.ServeEntries)
    // the door gets the BASE corpus only — it folds the batch in itself
    val door = new KnnInsertStream(base, g, ents)
    door.insertBatch(emb
      .filter(col("vec_id") < VectorQueries.InsertNewMax)
      .select("vec_id", "embedding"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select("qid", "rank", "nid", "cosine")
        .orderBy("qid", "rank").collect().toSeq.map(_.toSeq)
    assert(rows(door.standing) ==
      rows(VectorQueries.t84GraphInsert.run(spark, sf)))
  }

  test("a later batch walks THROUGH an earlier batch's inserted node") {
    // base: 10=v(10) ⟷ 20=v(11), entry 10. batch 1 inserts 5=v(12);
    // batch 2 inserts 6=v(13), whose TRUE nearest is 5 — reachable
    // only via the back edges batch 1 added to the standing graph.
    // route = false: this test isolates the GRAPH path (the router
    // would hand node 5 over directly and prove nothing)
    val emb = Seq((5L, v(12)), (6L, v(13)), (10L, v(10)), (20L, v(11)))
      .toDF("vec_id", "embedding")
    val base = scored(emb.filter(col("vec_id") >= 10L)).localCheckpoint()
    val init = Seq((10L, 1L, 20L, 62.0 / 64), (20L, 1L, 10L, 62.0 / 64))
      .toDF("qid", "rank", "nid", "cosine")
    val ents = Seq(10L).toDF("nid")

    val door = new KnnInsertStream(base, init, ents, k = 2, route = false)
    val b1 = fwd(door.insertBatch(
      emb.filter(col("vec_id") === 5L).select("vec_id", "embedding")))
    assert(b1 == Seq((1L, 20L), (2L, 10L))) // cos(5,20)=62/64 > cos(5,10)=60/64
    val b2 = fwd(door.insertBatch(
      emb.filter(col("vec_id") === 6L).select("vec_id", "embedding")))
    // node 5 found only through batch 1's standing back edges
    assert(b2 == Seq((1L, 5L), (2L, 20L)))
    assert(door.liveRows == 4L)

    // the stale-graph counterfactual: the same batch-2 insert against
    // the INITIAL graph cannot see node 5 at all
    val stale = new KnnInsertStream(base, init, ents, k = 2, route = false)
    val b2stale = fwd(stale.insertBatch(
      emb.filter(col("vec_id") === 6L).select("vec_id", "embedding")))
    assert(b2stale == Seq((1L, 20L), (2L, 10L)))

    // the stale-CORPUS counterfactual (why the door owns the vectors):
    // replay batch 2 through the RAW op against the batch-1 graph but
    // the UNEXTENDED corpus — node 5 sits in the graph, yet scoring
    // cannot fetch its vector, so the candidate silently drops and the
    // insert connects to the wrong nodes
    val b2raw = fwd(VectorQueries.graphInsert(
        base, door.standing.filter(col("qid") =!= 6L),
        VectorQueries.queryVecsOf(
          emb.filter(col("vec_id") === 6L).select("vec_id", "embedding")),
        ents, k = 2)
      .filter(col("qid") === 6L))
    assert(!b2raw.map(_._2).contains(5L))
  }

  test("mixed CRUD: batch-2 routes through a batch-1 insert connected across a batch-1 repair") {
    // chain 10=v(8) — 20=v(10) — 30=v(12), entry 10 ONLY. Batch 1
    // deletes the middle (20): the one-hop repair patches 10 ⟷ 30.
    // Batch 1 then inserts 5=v(13): its walk from entry 10 reaches its
    // true neighbor 30 ONLY over the repaired edge. Batch 2 inserts
    // 6=v(14): its true nearest is 5 — reachable only through batch
    // 1's insert (which itself needed the repair). Without the repair,
    // entry 10 is a dead end and none of this routes.
    val emb = Seq((5L, v(13)), (6L, v(14)), (10L, v(8)), (20L, v(10)),
      (30L, v(12))).toDF("vec_id", "embedding")
    val base = scored(emb.filter(col("vec_id") >= 10L)).localCheckpoint()
    val init = Seq(
      (10L, 1L, 20L, 60.0 / 64), (20L, 1L, 10L, 60.0 / 64),
      (20L, 2L, 30L, 60.0 / 64), (30L, 1L, 20L, 60.0 / 64)
    ).toDF("qid", "rank", "nid", "cosine")
    val ents = Seq(10L).toDF("nid")

    val door = new KnnInsertStream(base, init, ents, k = 2, route = false)
    val b1 = fwd(door.crudBatch(
      inserts = emb.filter(col("vec_id") === 5L)
        .select("vec_id", "embedding"),
      deletes = Seq(20L).toDF("vec_id")))
    // repair proven: 10's list now holds 30 (patched through 20)
    val g1 = door.standing
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(g1.contains((10L, 30L)) && g1.contains((30L, 10L)))
    assert(!g1.exists(p => p._1 == 20L || p._2 == 20L))
    // insert walked the repaired edge to its true neighbor
    assert(b1 == Seq((1L, 30L), (2L, 10L))) // cos(5,30)=62/64 > cos(5,10)=54/64
    assert(door.liveRows == 3L) // 10, 30, 5

    val b2 = fwd(door.insertBatch(
      emb.filter(col("vec_id") === 6L).select("vec_id", "embedding")))
    // true nearest (5) found through the batch-1 insert
    assert(b2 == Seq((1L, 5L), (2L, 30L)))
    assert(door.liveRows == 4L)
  }

  test("delete-then-REINSERT of the same id: the tombstone lifts and the new vector rules") {
    // 10=v(8), 20=v(10), 30=v(12), full chain, k=2. Batch 1 deletes
    // 30; batch 2 re-inserts id 30 with a DIFFERENT vector v(7) whose
    // nearest is now 10 (cos 62/64), not 20 (58/64)
    val emb = Seq((10L, v(8)), (20L, v(10)), (30L, v(12)))
      .toDF("vec_id", "embedding")
    val base = scored(emb).localCheckpoint()
    val init = Seq(
      (10L, 1L, 20L, 60.0 / 64), (10L, 2L, 30L, 56.0 / 64),
      (20L, 1L, 10L, 60.0 / 64), (20L, 2L, 30L, 60.0 / 64),
      (30L, 1L, 20L, 60.0 / 64), (30L, 2L, 10L, 56.0 / 64)
    ).toDF("qid", "rank", "nid", "cosine")
    val ents = Seq(10L).toDF("nid")

    val door = new KnnInsertStream(base, init, ents, k = 2, route = false)
    door.deleteBatch(Seq(30L).toDF("vec_id"))
    assert(door.liveRows == 2L)
    assert(door.liveCorpus.select("vec_id").as[Long].collect().sorted
      .toSeq == Seq(10L, 20L))
    val g1 = door.standing
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(!g1.exists(p => p._1 == 30L || p._2 == 30L))

    val b2 = fwd(door.insertBatch(
      Seq((30L, v(7))).toDF("vec_id", "embedding")))
    assert(b2 == Seq((1L, 10L), (2L, 20L)))
    assert(door.liveRows == 3L)
    // the live row for 30 carries the NEW embedding (v(7): 7 flips)
    val emb30 = door.liveCorpus.filter(col("vec_id") === 30L)
      .select("embedding").as[Array[Float]].collect()
    assert(emb30.length == 1 && emb30.head.count(_ < 0) == 7)
  }

  test("ROUTED multi-batch CRUD survives corpus-state swaps (the released-router regression)") {
    // three routed batches with a NON-EMPTY `added` state at batch 2+:
    // the router output references the pre-swap corpus checkpoints, so
    // a lazily-held routed frame dies with a truncated-lineage
    // block-not-found once the swap releases them (found by the ×10
    // CRUD ladder — the single-batch parity test can't see it, its
    // pre-swap added frame is empty)
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, sf)
    val e = scored(emb).localCheckpoint()
    val base = e.filter(col("vec_id") >= VectorQueries.InsertNewMax)
    val lsh = VectorQueries.annLshPairs(base, 12, 4,
        VectorQueries.LshBucketCap)
      .select("qid", "nid").localCheckpoint()
    val g = VectorQueries.nnDescentFrom(base,
      lsh.union(VectorQueries.seedFill(base, lsh, VectorQueries.KnnK)),
      VectorQueries.KnnK, VectorQueries.KnnRounds)
    val ents = base.select(col("vec_id").as("nid"))
      .orderBy("nid").limit(VectorQueries.ServeEntries)
    val door = new KnnInsertStream(base, g, ents) // route = true
    val raw = emb.select("vec_id", "embedding")
    val b1 = door.insertBatch(raw.filter(col("vec_id") < 5))
    assert(b1.select("qid").distinct().count() == 5)
    door.deleteBatch(raw.filter(col("vec_id") === 42L).select("vec_id"))
    val b2 = door.insertBatch(
      raw.filter(col("vec_id") >= 5 && col("vec_id") < 10))
    assert(b2.select("qid").distinct().count() == 5)
    assert(door.liveRows == e.count() - 1)
  }
}

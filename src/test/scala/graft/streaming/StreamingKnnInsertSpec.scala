package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries

/** The graph-insert door's contracts: (1) a single batch folded into
  * the standing graph is EXACTLY the batch gate — t84 row-for-row over
  * the same corpus split; (2) the door is genuinely stateful — a later
  * batch's serve walk routes THROUGH an earlier batch's inserted node
  * (on a hand graph where that node is the only path to the true
  * neighbor), which a stale-graph insert provably misses. */
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

  test("one-batch door equals the t84 batch gate row-for-row") {
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
    val door = new KnnInsertStream(e, g, ents)
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
    // only via the back edges batch 1 added to the standing graph
    val emb = Seq((5L, v(12)), (6L, v(13)), (10L, v(10)), (20L, v(11)))
      .toDF("vec_id", "embedding")
    val e = scored(emb).localCheckpoint()
    val init = Seq((10L, 1L, 20L, 62.0 / 64), (20L, 1L, 10L, 62.0 / 64))
      .toDF("qid", "rank", "nid", "cosine")
    val ents = Seq(10L).toDF("nid")
    def fwd(df: org.apache.spark.sql.DataFrame) =
      df.select("rank", "nid").as[(Long, Long)].collect().sorted.toSeq

    val door = new KnnInsertStream(e, init, ents, k = 2)
    val b1 = fwd(door.insertBatch(
      emb.filter(col("vec_id") === 5L).select("vec_id", "embedding")))
    assert(b1 == Seq((1L, 20L), (2L, 10L))) // cos(5,20)=62/64 > cos(5,10)=60/64
    val b2 = fwd(door.insertBatch(
      emb.filter(col("vec_id") === 6L).select("vec_id", "embedding")))
    // node 5 found only through batch 1's standing back edges
    assert(b2 == Seq((1L, 5L), (2L, 20L)))

    // the stale-graph counterfactual: the same batch-2 insert against
    // the INITIAL graph cannot see node 5 at all
    val stale = new KnnInsertStream(e, init, ents, k = 2)
    val b2stale = fwd(stale.insertBatch(
      emb.filter(col("vec_id") === 6L).select("vec_id", "embedding")))
    assert(b2stale == Seq((1L, 20L), (2L, 10L)))
  }
}

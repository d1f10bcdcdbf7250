package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t82 NN-Descent contracts on HAND graphs — the recurrence semantics
  * independent of the LSH seed derivation (the GraphQueriesSpec
  * pattern): the refinement must RECOVER a true neighbor the bucketed
  * seed structurally misses (the whole reason the gate exists), the
  * per-node k cap must hold every round, and ties must break on nid. */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim all-ones with the given dims flipped to −1. */
  private def v(flips: Int*): Array[Float] = {
    val x = Array.fill(64)(1.0f)
    flips.foreach(i => x(i) = -1.0f)
    x
  }

  /** The scored-vector frame nnDescentFrom consumes (embScaled's
    * shape, built through the same scaleL + long_dot path). */
  private def scored(emb: org.apache.spark.sql.DataFrame) =
    emb.select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))

  test("NN-Descent recovers the cross-bucket neighbor the LSH seed misses") {
    // bits=4, tables=2 ⇒ table 0 keys on dims 0,2,4,6; table 1 on
    // dims 1,3,5,7. a flips dim 1 (escapes b's table-1 bucket only),
    // c flips dim 0 (escapes b's table-0 bucket only) ⇒ a–b collide in
    // table 0, b–c in table 1, a–c in NEITHER: the seed cannot pair
    // them, though cos(a,c) = 60/64 — exactly the transitive case
    // NN-Descent exists for.
    val emb = Seq((10L, v(1)), (20L, v()), (30L, v(0)))
      .toDF("vec_id", "embedding")
    val seed = VectorQueries.annLshPairs(emb, bits = 4, tables = 2,
      bucketCap = 10)
    val seedPairs = seed.select("qid", "nid").as[(Long, Long)]
      .collect().toSet
    assert(seedPairs == Set((10L, 20L), (20L, 10L), (20L, 30L), (30L, 20L)))

    val g = VectorQueries.nnDescentFrom(scored(emb), seed, k = 2, rounds = 1)
      .select("qid", "rank", "nid", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // one local-join round: a→b→c yields candidate (a,c), kept at
    // rank 2 (cos 60/64 = 0.9375 < cos(a,b) = 62/64 = 0.96875)
    val a = g.filter(_._1 == 10L).sortBy(_._2)
    assert(a.map(x => (x._2, x._3)).toSeq == Seq((1L, 20L), (2L, 30L)))
    assert(math.abs(a(0)._4 - 62.0 / 64) < 1e-12)
    assert(math.abs(a(1)._4 - 60.0 / 64) < 1e-12)
    // symmetric recovery on the other end of the chain
    val c = g.filter(_._1 == 30L).sortBy(_._2)
    assert(c.map(x => (x._2, x._3)).toSeq == Seq((1L, 20L), (2L, 10L)))
    // b's two original neighbors tie on cosine — nid breaks the tie
    val b = g.filter(_._1 == 20L).sortBy(_._2)
    assert(b.map(x => (x._2, x._3)).toSeq == Seq((1L, 10L), (2L, 30L)))
  }

  test("k cap holds every round; rounds=0 is the scored seed itself") {
    // a 6-clone pile: every node's candidate list exceeds k from the
    // seed on — the cut must hold at k per node after every round
    val emb = (0 until 6).map(i => (i.toLong, v(i + 8)))
      .toDF("vec_id", "embedding")
    val seed = VectorQueries.annLshPairs(emb, bits = 4, tables = 2,
      bucketCap = 10)
    val e = scored(emb)
    val g0 = VectorQueries.nnDescentFrom(e, seed, k = 3, rounds = 0)
    val g2 = VectorQueries.nnDescentFrom(e, seed, k = 3, rounds = 2)
    for (g <- Seq(g0, g2)) {
      val perNode = g.groupBy("qid").count().collect()
      assert(perNode.forall(_.getLong(1) <= 3))
      assert(perNode.length == 6)
    }
    // all six share every bucket: the seed is already the complete
    // graph, so refinement cannot change the top-3 — fixed point
    val s0 = g0.select("qid", "rank", "nid").as[(Long, Long, Long)]
      .collect().toSet
    val s2 = g2.select("qid", "rank", "nid").as[(Long, Long, Long)]
      .collect().toSet
    assert(s0 == s2)
  }

  test("seed fill: starved nodes get the md5-derived partners, seeded nodes none") {
    // 5 vectors, ids 0..4 (dense, so position == vec_id); the seed
    // covers only 0 and 1 — 2, 3, 4 are starved and must each receive
    // the deterministic hash-random partners, k = 3 probes apiece
    val emb = (0 until 5).map(i => (i.toLong, v(i)))
      .toDF("vec_id", "embedding")
    val e = scored(emb)
    val seed = Seq((0L, 1L), (1L, 0L)).toDF("qid", "nid")
    val fill = VectorQueries.seedFill(e, seed, k = 3)
      .as[(Long, Long)].collect().toSet
    // INDEPENDENT derivation of the expected pairs — java MessageDigest,
    // not the Spark expression under test: first 12 md5 hex chars of
    // "id:i" as a long, mod N, self-hits dropped
    def h48mod(id: Long, i: Long, n: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$i".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(6).map(b => f"$b%02x").mkString, 16) % n
    }
    val expected = (for {
      s <- Seq(2L, 3L, 4L); i <- 0L until 3L
      t = h48mod(s, i, 5)
      if t != s
    } yield (s, t)).toSet
    assert(fill == expected, s"fill $fill != independent md5 $expected")
    // no fill edge for covered nodes; targets are corpus members
    assert(fill.forall { case (q, n) => q >= 2L && n >= 0L && n < 5L })
    // deterministic: a second invocation is identical
    assert(VectorQueries.seedFill(e, seed, k = 3)
      .as[(Long, Long)].collect().toSet == fill)
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t83 beam-search contracts: the walk semantics on a HAND graph
  * (reach is exactly rounds hops; the beam is monotone; ranks break
  * ties the documented way), plus the measured recall of the full
  * LSH-seed → NN-Descent → serve composition against t5's brute-force
  * truth over the same queries. */
class KnnServeSpec extends SparkSpec {
  import spark.implicits._

  /** all-ones with the given number of leading dims flipped: cosine
    * to the all-ones query is (64 − 2·flips)/64 — a controlled,
    * strictly ordered similarity ladder. */
  private def v(flips: Int): Array[Float] =
    Array.tabulate(64)(i => if (i < flips) -1.0f else 1.0f)

  private def scored(emb: org.apache.spark.sql.DataFrame) =
    emb.select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))

  test("beam walk reaches exactly `rounds` hops from the entry, best-first") {
    // a path graph 1–2–3–4–5 whose similarity to query 0 INCREASES
    // along the path (flips 5,4,3,2,1); entry = node 1 (the worst)
    val emb = ((0L, v(0)) +: (1 to 5).map(i => (i.toLong, v(6 - i))))
      .toDF("vec_id", "embedding")
    val e = scored(emb)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("qid", "nid")
    val qids = Seq(0L).toDF("qid")
    val ents = Seq(1L).toDF("nid")
    def serve(rounds: Int) =
      VectorQueries.knnServeFrom(e, edges, qids, ents,
          beam = 2, rounds = rounds, k = 2)
        .select("qid", "rank", "nid", "cosine").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    // 3 rounds: the frontier advances one hop per round past the
    // entry — node 4 is reachable (3 hops), node 5 is NOT
    val r3 = serve(3)
    assert(r3.map(x => (x._1, x._2)).toSeq == Seq((1L, 4L), (2L, 3L)))
    assert(math.abs(r3(0)._3 - 60.0 / 64) < 1e-12)
    assert(math.abs(r3(1)._3 - 58.0 / 64) < 1e-12)
    // 4 rounds: node 5 (the true best) enters and wins
    assert(serve(4).map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 5L), (2L, 4L)))
  }

  test("serve recall vs the gated brute-force truth (t5 queries)") {
    val sf = "/root/testdata/sf0.001"
    val truth = VectorQueries.t5AnnBruteForce.run(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val got = VectorQueries.t83KnnServe.run(spark, sf)
      .select("query_id", "nid").as[(Long, Long)].collect().toSet
    assert(got.forall { case (q, n) => q != n }) // self never served
    val recall = (truth & got).size.toDouble / truth.size
    info(f"t83 recall@5 vs t5 brute force: $recall%.3f")
    // measured 0.80 at HEAD with beam 32 / rounds 5 (the full curve —
    // 0.58/0.66/0.80/0.90 up the beam dial — is in the ServeBeam
    // scaladoc and COVERAGE r18); the assert is a regression floor
    assert(recall >= 0.65, f"recall $recall%.3f fell below the floor")
  }
}

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

  test("routed entries join the round-0 beam; fixed-only cannot reach what routing can") {
    // same path graph 1–2–3–4–5 (similarity increases along the path);
    // with ONE round from fixed entry 1 the walk sees only {1,2} — a
    // routed entry pair (0→4) puts the query next to the good end, so
    // the same single round reaches node 5 (the true best)
    val emb = ((0L, v(0)) +: (1 to 5).map(i => (i.toLong, v(6 - i))))
      .toDF("vec_id", "embedding")
    val e = scored(emb)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("qid", "nid")
    val qids = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("eL").as("qL"),
        col("ss").as("qss"))
    val ents = Seq(1L).toDF("nid")
    def serve(routed: Option[org.apache.spark.sql.DataFrame]) =
      VectorQueries.knnServeVecs(e, edges, qids, ents,
          beam = 2, rounds = 1, k = 2, routed = routed)
        .select("rank", "nid").as[(Long, Long)].collect().sorted.toSeq
    assert(serve(None) == Seq((1L, 2L), (2L, 1L)))
    assert(serve(Some(Seq((0L, 4L)).toDF("qid", "nid"))) ==
      Seq((1L, 5L), (2L, 4L)))
  }

  test("annLshEntries: over-cap buckets screened, per-query entry cap holds") {
    // 40 clones form one over-cap bucket per table; two distinct
    // vectors share a small bucket in table 1 only (the ScaleGuard
    // shape). A clone query gets NO routed entries (its buckets are
    // all hot — the fixed-entry backstop's case); vector 100 routes to
    // its small-bucket mate 101 and nothing else.
    val corpus = ((0 until 40).map(i => (i.toLong, Array.fill(64)(1.0f))) ++
      Seq((100L, Array.tabulate(64)(d => if (d % 2 == 0) 1.0f else -1.0f)),
        (101L, Array.tabulate(64)(d => if (d % 2 == 0) 1.0f else -1.0f))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(0L, 100L))
    val entries = VectorQueries.annLshEntries(corpus, queries,
        bits = 4, tables = 2, bucketCap = 10, maxEntries = 5)
      .as[(Long, Long)].collect().toSet
    assert(entries == Set((100L, 101L)), s"got $entries")
    // with the cap relaxed, the clone query routes to its mates,
    // capped at maxEntries by ascending nid — deterministic
    val relaxed = VectorQueries.annLshEntries(corpus, queries,
        bits = 4, tables = 2, bucketCap = 1000, maxEntries = 5)
      .as[(Long, Long)].collect().toSet
    assert(relaxed.filter(_._1 == 0L) ==
      Set((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)))
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

    // t85's routed serve on the SAME (random-embedding) corpus: the
    // easy case where fixed entries already navigate — routing must
    // not fall below the fixed-entry floor here (its win is the
    // clustered decade corpus: 0.000 fixed vs 1.000 routed, COVERAGE
    // r19). Not strictly ≥ t83 point-for-point (a wider round-0 beam
    // reshuffles survivors), but the floor must hold.
    val gotR = VectorQueries.t85RoutedServe.run(spark, sf)
      .select("query_id", "nid").as[(Long, Long)].collect().toSet
    val recallR = (truth & gotR).size.toDouble / truth.size
    info(f"t85 routed recall@5 vs t5 brute force: $recallR%.3f")
    assert(recallR >= 0.65, f"routed recall $recallR%.3f below the floor")
  }
}

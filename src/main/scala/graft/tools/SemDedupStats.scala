package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.spark.Sessions

/** Measurement tool for the SemDeDup k ∝ N claim: runs a semdedup
  * query against a (scaled) dir and reports the REALIZED per-cluster
  * membership and pair-block distribution — the quantity t57c's design
  * bounds (expected size ≈ target ⇒ per-cluster pairs ≈ C(target, 2))
  * and the ×100 COVERAGE row records. Stats come straight off the
  * query's own output frame (cluster column), so the tool measures the
  * operator as shipped, not a reimplementation.
  *
  * Usage: runMain graft.tools.SemDedupStats [dir] [queryName]
  */
object SemDedupStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val name = if (args.length > 1) args(1) else "t57c_semdedup_prod"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // --assign-only: measure the CLUSTERING distribution without paying
    // the pair stage (the k ∝ N question is about sizes, and at skewed
    // operating points the pair stage is exactly what we're sizing)
    val out =
      if (args.contains("--assign-only")) {
        import org.apache.spark.sql.functions.{ceil => _, _}
        import graft.queries.VectorQueries.{LloydIters, LloydK, SemDedupTarget}
        val emb = graft.Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            graft.queries.VectorQueries.scaleL(col("embedding")).as("eL"))
        val n = emb.count()
        // t57c's own operating point — read from the shipped constants
        // so this tool can never measure a different model
        val k = math.max(LloydK,
          math.ceil(n.toDouble / SemDedupTarget).toInt)
        graft.ops.KMeans.fit(emb, k, LloydIters)
          .select(col("vec_id"), col("cid").as("cluster"))
      } else SparkEntry.queries(name)(spark, dir)
        .select("vec_id", "cluster")
    val sizes = out.groupBy("cluster").agg(count(lit(1)).as("m"))
      .localCheckpoint()
    val row = sizes.agg(
      count(lit(1)).as("k_realized"),
      sum("m").as("n_vecs"),
      max("m").as("max_m"),
      expr("percentile(m, 0.99)").as("p99_m"),
      avg("m").as("mean_m"),
      sum(expr("m * (m - 1) div 2")).as("total_pairs"),
      max(expr("m * (m - 1) div 2")).as("max_cluster_pairs"))
      .collect()(0)
    println(s"[semdedup-stats] $name @ $dir: " +
      s"n_vecs=${row.get(1)} k_realized=${row.get(0)} " +
      s"mean_m=${row.get(4)} p99_m=${row.get(3)} max_m=${row.get(2)} " +
      s"total_pairs=${row.get(5)} max_cluster_pairs=${row.get(6)}")
    spark.stop()
  }
}

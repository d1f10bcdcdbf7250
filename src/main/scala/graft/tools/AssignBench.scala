package graft.tools

import org.apache.spark.sql.functions._

import graft.spark.Sessions

/** Measurement tool for t65's claim: at the k ∝ N operating point the
  * flat E-step is O(N·k) and the two-level (coarse-quantizer) serve
  * path is O(N·(kc + kf/kc)). Runs BOTH assignment forms over the same
  * (scaled) embeddings with kf = ⌈N/32⌉ fine and kc = ⌈√kf⌉ coarse
  * SEED centroids (first-k vectors — assignment cost is independent of
  * centroid quality, and seeding skips a Lloyd run the measurement
  * doesn't need), times each, and reports the in_cell fraction plus
  * the agreement rate between the two (border vectors may differ — the
  * documented IVF trade). COVERAGE records the ×100 row.
  *
  * Usage: runMain graft.tools.AssignBench [dir] [--skip-flat]
  *          [--nprobe p1,p2,...] [--train]
  * (`dir` must come first: positional parsing takes the head arg.)
  */
object AssignBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        graft.queries.VectorQueries.scaleL(col("embedding")).as("eL"))
      .localCheckpoint()
    val n = emb.count()
    // t57c's k ∝ N operating point, read from the shipped constants
    import graft.queries.VectorQueries.{LloydK, SemDedupTarget}
    val kf = math.max(LloydK, math.ceil(n.toDouble / SemDedupTarget).toInt)
    val kc = math.max(2, math.ceil(math.sqrt(kf.toDouble)).toInt)
    def seeds(k: Int) = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("eL").as("cL"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // --train: 2 Lloyd iterations per model instead of raw first-k
    // seeds — answers whether the agreement-vs-flat level is a
    // seeding artifact (seed cells are ill-separated) at the cost of
    // the flat-E-step training the serve path then avoids forever
    val train = args.contains("--train")
    val (fine, coarse) =
      if (train) {
        val (f, tF) = timed(graft.ops.KMeans
          .fitCentroids(emb, kf, 2).localCheckpoint())
        val (c, tC) = timed(graft.ops.KMeans
          .fitCentroids(emb, kc, 2).localCheckpoint())
        println(f"[assign-bench] trained fine=$tF%.2fs coarse=$tC%.2fs")
        (f, c)
      } else (seeds(kf).localCheckpoint(), seeds(kc).localCheckpoint())
    // --nprobe p1,p2,... sweeps the probe widths (default just p=1)
    val probes = args.sliding(2).collectFirst {
      case Array("--nprobe", ps) => ps.split(",").map(_.trim.toInt).toSeq
    }.getOrElse(Seq(1))
    val flatOpt =
      if (args.contains("--skip-flat")) None
      else {
        val (flat, tFlat) = timed {
          graft.ops.KMeans.assign(emb, fine).localCheckpoint()
        }
        println(f"[assign-bench] flat=$tFlat%.2fs")
        Some((flat, tFlat))
      }
    for (p <- probes) {
      val (two, tTwo) = timed {
        graft.ops.KMeans.assignTwoLevel(emb, coarse, fine, p)
          .localCheckpoint()
      }
      val inCell = two.filter(col("in_cell")).count()
      val agreeStr = flatOpt.map { case (flat, tFlat) =>
        val agree = two.select(col("vec_id"), col("cid").as("c2"))
          .join(flat.select(col("vec_id"), col("cid").as("c1")), "vec_id")
          .filter(col("c1") === col("c2")).count()
        f" agree=$agree/$n speedup=${tFlat / tTwo}%.1fx"
      }.getOrElse("")
      println(f"[assign-bench] n=$n kf=$kf kc=$kc nprobe=$p " +
        f"two_level=$tTwo%.2fs in_cell=$inCell/$n$agreeStr")
    }
    spark.stop()
  }
}

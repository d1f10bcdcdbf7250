package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.VectorQueries
import graft.spark.Sessions

/** Graph-ANN SERVE LADDER over a non-saturated scale graph (VERDICT
  * r18 item 1b): t83's decade rows inherit the gate-config graph's
  * saturation cliff, so this tool measures the serve recurrence where
  * it actually operates at scale — over the t82c DENSE-SEED scale
  * graph (bits=12 × tables=4 + the hash-random seed fill) built live
  * on a decade dir's embeddings. Per (beam, rounds) point it prints
  * serve wall, result rows, and RECALL@k against the exact brute
  * truth for the t5 query set (10 queries × corpus — one broadcast
  * pass, linear and cheap at any decade). The build line carries the
  * graph's NODE COVERAGE (distinct qids / corpus), the number the
  * ×1000 dense-seed story is about.
  *
  * Usage: runMain graft.tools.ServeLadder [dir] [--points=32x5,48x6]
  * (dir holds embeddings.parquet; decade dirs via ScaleCheck) */
object ServeLadder {

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val dir = pos.headOption.getOrElse("/tmp/graft_sf1")
    val points = args.collectFirst {
      case a if a.startsWith("--points=") =>
        a.stripPrefix("--points=").split(',').toSeq.map { p =>
          val Array(b, r) = p.split('x'); (b.toInt, r.toInt)
        }
    }.getOrElse(Seq((16, 4), (32, 5), (48, 6)))
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))
      .localCheckpoint()
    val n = e.count()

    // the t82c build: scale keys + dense seed + NN-Descent
    val t0 = System.nanoTime()
    val lsh = VectorQueries.annLshPairs(e, 12, 4,
        VectorQueries.LshBucketCap)
      .select("qid", "nid").localCheckpoint()
    val seed = lsh.union(
      VectorQueries.seedFill(e, lsh, VectorQueries.KnnK))
    val g = VectorQueries.nnDescentFrom(e, seed,
      VectorQueries.KnnK, VectorQueries.KnnRounds)
    graft.queries.Clustering.release(lsh)
    val gRows = g.count()
    val covered = g.select("qid").distinct().count()
    val tBuild = (System.nanoTime() - t0) / 1e9
    println(f"[serve] build dir=$dir n=$n%d rows=$gRows%d " +
      f"coverage=${covered.toDouble / n}%.3f wall=$tBuild%.1fs")

    val edges = g.select("qid", "nid")
    val qvecs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("eL").as("qL"),
        col("ss").as("qss"))
      .localCheckpoint()
    val ents = e.select(col("vec_id").as("nid"))
      .orderBy("nid").limit(VectorQueries.ServeEntries)
      .localCheckpoint()

    // exact truth for the same queries: one broadcast pass, top-k
    val k = VectorQueries.ServeK
    val cos = broadcast(qvecs)
      .crossJoin(e.select(col("vec_id").as("nid"), col("eL").as("nL"),
        col("ss").as("nss")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (call_function("long_dot", col("qL"), col("nL")).cast("double")
          / lit(1e12) / (sqrt(col("qss")) * sqrt(col("nss")))).as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    val t1 = System.nanoTime()
    val truth = cos.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[serve] brute truth: ${truth.size}%d pairs " +
      f"wall=${(System.nanoTime() - t1) / 1e9}%.1fs")

    // per-query routed entries off the standing LSH index (the t85
    // composition) — on a clustered corpus the fixed-entry walk has no
    // gradient between islands; the routed one starts on the query's
    val routed = VectorQueries.annLshEntries(
        e.select("vec_id", "embedding"),
        e.filter(col("vec_id") < 10).select("vec_id", "embedding"),
        12, 4, VectorQueries.LshBucketCap, VectorQueries.RouteEntries)
      .localCheckpoint()

    points.foreach { case (beam, rounds) =>
      Seq(("fixed", None), ("routed", Some(routed))).foreach {
        case (mode, r) =>
          val t2 = System.nanoTime()
          val served: DataFrame = VectorQueries.knnServeVecs(
            e, edges, qvecs, ents, beam, rounds, k,
            materialize = true, routed = r)
          val got = served.select("qid", "nid")
            .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
          val wall = (System.nanoTime() - t2) / 1e9
          val recall = (truth & got).size.toDouble / truth.size
          println(f"[serve] $mode%-6s beam=$beam%-3d rounds=$rounds%-2d " +
            f"rows=${got.size}%4d recall@$k=$recall%.3f wall=$wall%.1fs")
          graft.queries.Clustering.release(served)
      }
    }
    spark.stop()
  }
}

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
  * The build line also carries EDGE QUALITY (VERDICT r19 item 7) —
  * the fraction of the query nodes' graph edges that sit in their
  * brute top-k: coverage says every node HAS k edges, quality says
  * they're the RIGHT ones, and a graph change that trades silent
  * quality for wall time now moves a printed number. `--insert` adds
  * the INSERT-QUALITY rows (VERDICT r19 item 1): the t84 split (base
  * graph over vec_id ≥ 10, the 10 query vectors inserted), forward-
  * edge recall vs the base-corpus brute truth, ROUTED vs the unrouted
  * counterfactual — the measurement that showed the unrouted insert
  * connects to the wrong island on clustered corpora.
  *
  * Usage: runMain graft.tools.ServeLadder [dir] [--points=32x5,48x6]
  * [--insert] (dir holds embeddings.parquet; decade dirs via
  * ScaleCheck) */
object ServeLadder {

  /** Measured resident footprint of a localCheckpointed frame (the
    * storage layer's own numbers for the persisted blocks). */
  private def ckptBytes(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame): Long =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        spark.sparkContext.getRDDStorageInfo.find(_.id == lr.rdd.id)
          .map(i => i.memSize + i.diskSize).getOrElse(-1L)
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val dir = pos.headOption.getOrElse("/tmp/graft_sf1")
    val withInsert = args.contains("--insert")
    val withPq = args.contains("--pq")
    val withCrud = args.contains("--crud")
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

    // build EDGE QUALITY: of the query nodes' own graph edges, the
    // fraction that are true top-k neighbors (coverage says every
    // node has k edges; this says they're the right ones)
    val qEdges = g.filter(col("qid") < 10).select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[serve] build edge-quality: " +
      f"${(truth & qEdges).size.toDouble / truth.size}%.3f " +
      f"(${(truth & qEdges).size}%d of ${truth.size}%d true edges held)")

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

    if (withInsert) {
      // INSERT QUALITY (the t84 split): base graph over vec_id ≥ 10,
      // the 10 query vectors inserted; forward-edge recall vs the
      // base-corpus brute truth, routed vs unrouted
      val base = e.filter(col("vec_id") >= 10).localCheckpoint()
      val tb = System.nanoTime()
      val blsh = VectorQueries.annLshPairs(base, 12, 4,
          VectorQueries.LshBucketCap)
        .select("qid", "nid").localCheckpoint()
      val bg = VectorQueries.nnDescentFrom(base,
        blsh.union(VectorQueries.seedFill(base, blsh, VectorQueries.KnnK)),
        VectorQueries.KnnK, VectorQueries.KnnRounds)
      graft.queries.Clustering.release(blsh)
      println(f"[serve] insert base build " +
        f"wall=${(System.nanoTime() - tb) / 1e9}%.1fs")
      val kk = VectorQueries.KnnK
      val bTruth = cos.filter(col("nid") >= 10)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= kk).select("qid", "nid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bEnts = base.select(col("vec_id").as("nid"))
        .orderBy("nid").limit(VectorQueries.ServeEntries)
        .localCheckpoint()
      val iRouted = VectorQueries.annLshEntries(
          base.select("vec_id", "embedding"),
          e.filter(col("vec_id") < 10).select("vec_id", "embedding"),
          12, 4, VectorQueries.LshBucketCap, VectorQueries.RouteEntries)
        .localCheckpoint()
      Seq(("unrouted", None), ("routed", Some(iRouted))).foreach {
        case (mode, r) =>
          val t3 = System.nanoTime()
          val ins = VectorQueries.graphInsert(e, bg, qvecs, bEnts, kk,
            materialize = true, routed = r, corpusRows = Some(n))
          val fwdE = ins.filter(col("qid") < 10).select("qid", "nid")
            .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
          val wall = (System.nanoTime() - t3) / 1e9
          val rec = (bTruth & fwdE).size.toDouble / bTruth.size
          println(f"[serve] insert $mode%-8s fwd-edge-recall@$kk=" +
            f"$rec%.3f (${(bTruth & fwdE).size}%d/${bTruth.size}%d) " +
            f"wall=$wall%.1fs")
          graft.queries.Clustering.release(ins)
      }
    }

    if (withPq) {
      // PQ-RESIDENT SERVE (the t87 composition past VecBroadcastMaxRows):
      // ADC-scored beam rounds off the resident codes, exact rerank on
      // the final beam only. Rows: recall vs brute truth, agreement vs
      // the exact-scored routed serve, and the MEASURED resident bytes
      // of codes vs full vectors (the footprint the tier exists for)
      val tq = System.nanoTime()
      val (enc, lut) = VectorQueries.pqServeModel(spark, dir,
        e.filter(col("vec_id") < 10).select("vec_id", "embedding"))
      val encRows = enc.count()
      println(f"[serve] pq model: $encRows%d code rows " +
        f"codes_bytes=${ckptBytes(spark, enc)}%d " +
        f"vectors_bytes=${ckptBytes(spark, e)}%d " +
        f"wall=${(System.nanoTime() - tq) / 1e9}%.1fs")
      val t5 = System.nanoTime()
      val exact = VectorQueries.knnServeVecs(e, edges, qvecs, ents,
        32, 5, k, materialize = true, routed = Some(routed))
      val exactSet = exact.select("qid", "nid")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      graft.queries.Clustering.release(exact)
      val tExact = (System.nanoTime() - t5) / 1e9
      val t6 = System.nanoTime()
      val pq = VectorQueries.knnServePqVecs(e, edges, enc, lut, qvecs,
        ents, 32, 5, k, materialize = true, routed = Some(routed))
      val pqSet = pq.select("qid", "nid")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      graft.queries.Clustering.release(pq)
      val tPq = (System.nanoTime() - t6) / 1e9
      println(f"[serve] pq     beam=32  rounds=5  rows=${pqSet.size}%4d " +
        f"recall@$k=${(truth & pqSet).size.toDouble / truth.size}%.3f " +
        f"vs-exact-routed=${(exactSet & pqSet).size.toDouble /
          math.max(1, exactSet.size)}%.3f " +
        f"wall=$tPq%.1fs (exact-routed wall=$tExact%.1fs)")
    }

    if (withCrud) {
      // DEGRADATION-THEN-RESTORE across ≥3 CRUD batches (VERDICT r19
      // item 4's COVERAGE row): insert a batch, surgically delete a
      // 2-hop neighborhood (the repair-pool-killing cut t88 gates),
      // insert another batch, then consolidate — degree census after
      // every step, honest zeros included
      val base = e.filter(col("vec_id") >= 10).localCheckpoint()
      val tb = System.nanoTime()
      val blsh = VectorQueries.annLshPairs(base, 12, 4,
          VectorQueries.LshBucketCap)
        .select("qid", "nid").localCheckpoint()
      val bg = VectorQueries.nnDescentFrom(base,
        blsh.union(VectorQueries.seedFill(base, blsh, VectorQueries.KnnK)),
        VectorQueries.KnnK, VectorQueries.KnnRounds)
      graft.queries.Clustering.release(blsh)
      val bEnts = base.select(col("vec_id").as("nid"))
        .orderBy("nid").limit(VectorQueries.ServeEntries)
        .localCheckpoint()
      println(f"[crud] base build wall=${(System.nanoTime() - tb) / 1e9}%.1fs")
      val door = new graft.streaming.KnnInsertStream(base, bg, bEnts)
      def census(tag: String, wall: Double): Unit = {
        val degs = door.standing.groupBy("qid")
          .agg(count(lit(1)).as("dg"))
        val subK = degs.filter(col("dg") < VectorQueries.KnnK).count()
        val absent = door.liveCorpus.select("vec_id")
          .join(degs, col("vec_id") === col("qid"), "left_anti").count()
        println(f"[crud] $tag%-12s live=${door.liveRows}%d " +
          f"sub-k=$subK%d absent=$absent%d wall=$wall%.1fs")
      }
      val raw = e.select("vec_id", "embedding")
      var t = System.nanoTime()
      door.insertBatch(raw.filter(col("vec_id") < 5))
      census("insert[0-4]", (System.nanoTime() - t) / 1e9)
      // the surgical cut: node 0's 2-hop out-neighborhood (never 0)
      val g0 = door.standing
      val h1 = g0.filter(col("qid") === 0L).select(col("nid").as("vec_id"))
      val h2 = g0.filter(col("qid") === 0L).select(col("nid").as("m"))
        .join(g0.select(col("qid").as("m"), col("nid")), "m")
        .select(col("nid").as("vec_id"))
      val dels = h1.union(h2).filter(col("vec_id") =!= 0L).distinct()
        .localCheckpoint()
      val nDel = dels.count()
      t = System.nanoTime()
      door.deleteBatch(dels)
      census(f"delete[$nDel%d]", (System.nanoTime() - t) / 1e9)
      t = System.nanoTime()
      door.insertBatch(raw.filter(col("vec_id") >= 5 && col("vec_id") < 10))
      census("insert[5-9]", (System.nanoTime() - t) / 1e9)
      t = System.nanoTime()
      door.consolidate()
      census("consolidate", (System.nanoTime() - t) / 1e9)
    }
    spark.stop()
  }
}

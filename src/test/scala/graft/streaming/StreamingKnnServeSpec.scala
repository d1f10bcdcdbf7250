package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.queries.VectorQueries

/** The ANN-serve door's parity contract (VERDICT r18 item 7): query
  * vectors streamed in micro-batches against the STANDING t82 graph
  * must be answered exactly as the batch gate answers them — t83
  * row-for-row over the same query set. The source is split across
  * multiple files with maxFilesPerTrigger=1, so the door genuinely
  * serves incrementally; per-batch answers are appended and compared
  * as a whole (serve is per-query independent, so the union IS the
  * batch answer — the property that makes the door stateless). */
class StreamingKnnServeSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private val tmpDirs = scala.collection.mutable.Buffer.empty[String]

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toString
    tmpDirs += d
    d
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { dir =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    super.afterAll()
  }

  test("streamed queries served off the standing graph equal t83 row-for-row") {
    // the standing model, published once: corpus vectors (embScaled
    // shape), the t82 gate-config graph, the t83 entry points — built
    // through the same gate-shared helpers the batch side composes
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))
      .localCheckpoint()
    val edges = VectorQueries.nnDescentFrom(e,
        VectorQueries.annLshPairs(e, VectorQueries.LshBits,
          VectorQueries.LshTables, VectorQueries.LshBucketCap),
        VectorQueries.KnnK, VectorQueries.KnnRounds)
      .select("qid", "nid")
    val ents = e.select(col("vec_id").as("nid"))
      .orderBy("nid").limit(VectorQueries.ServeEntries)
      .localCheckpoint() // broadcast side, reused every batch

    // the t83 query set, split into ≥2 files → ≥2 micro-batches
    val queries = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10).select("vec_id", "embedding")
    val srcDir = tmp("ks_src")
    queries.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    val outDir = tmp("ks_out")
    var batches = 0
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        KnnServeStream.serveBatch(b, e, edges, ents)
          .write.mode("append").parquet(outDir)
        batches += 1
      }.start()
    q.awaitTermination()
    assert(batches >= 2, s"expected one batch per file, got $batches")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val streamed = rows(spark.read.parquet(outDir)
      .select("query_id", "rank", "nid", "cosine"))
    val batch = rows(VectorQueries.t83KnnServe.run(spark, sf))
    assert(streamed == batch,
      s"door drifted from t83: ${streamed.size} vs ${batch.size} rows")
  }

  test("ROUTED micro-batches equal t85 row-for-row (per-batch LSH entries, hoisted count)") {
    // the production serve tier: the door computes each batch's own
    // LSH entry routing (the t85 composition) — REQUIRED on clustered
    // corpora, where fixed entries measure recall 0.000 (COVERAGE
    // r19). The corpus row count is hoisted to door wiring time
    // (ADVICE r19): serveBatch never runs a per-batch count job.
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))
      .localCheckpoint()
    val n = e.count() // once, at wiring time
    val lsh = VectorQueries.annLshPairs(e, 12, 4,
        VectorQueries.LshBucketCap)
      .select("qid", "nid").localCheckpoint()
    val edges = VectorQueries.nnDescentFrom(e,
        lsh.union(VectorQueries.seedFill(e, lsh, VectorQueries.KnnK)),
        VectorQueries.KnnK, VectorQueries.KnnRounds)
      .select("qid", "nid")
    val ents = e.select(col("vec_id").as("nid"))
      .orderBy("nid").limit(VectorQueries.ServeEntries)
      .localCheckpoint()

    val queries = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10).select("vec_id", "embedding")
    val srcDir = tmp("ksr_src")
    queries.repartition(3).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    val outDir = tmp("ksr_out")
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        KnnServeStream.serveBatch(b, e, edges, ents,
            route = true, corpusRows = Some(n))
          .write.mode("append").parquet(outDir)
      }.start()
    q.awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("query_id", "rank").collect().toSeq.map(_.toSeq)
    val streamed = rows(spark.read.parquet(outDir)
      .select("query_id", "rank", "nid", "cosine"))
    val batch = rows(VectorQueries.t85RoutedServe.run(spark, sf))
    assert(streamed == batch,
      s"routed door drifted from t85: ${streamed.size} vs ${batch.size} rows")
  }
}

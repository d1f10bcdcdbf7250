package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.queries.TextQueries

/** The streaming curation tier exercised END TO END as one
  * AvailableNow pass over the corpus — the streaming twin of the x8
  * batch e2e gate. Four legs ride ONE file-source read of the same
  * prefix: exact dedup ([[CurationStream.dedupe]]), LSH near-dup
  * candidates ([[StreamingNearDup]]), the running length histogram
  * ([[SketchStream]]), and the stateless per-doc verdict+split
  * ([[CurationStream.verdictSplit]]). Finalization (what a production
  * pipeline runs at checkpoint/publish time) resolves the accumulated
  * candidate pairs into clusters with the SAME connected-components
  * operator the batch tier uses and joins the verdict leg into the
  * manifest row shape — and the result must EQUAL the batch
  * `t28_curation_manifest` manifest over the same prefix, row for row.
  *
  * Why t28 and not t28b: the streaming candidate set equals t2's pair
  * set (StreamingNearDupSpec pins it), and CC over those pairs IS
  * t21's full-pair clustering — t28's cluster side. t28b's star
  * clustering is a refinement that can split full clusters (it does
  * at sf0.001: two docs cluster with 216 under full pairs but stand
  * alone under star edges; at sf0.01 t33 measures 500/500 agreement),
  * so the streamed manifest meets t28b exactly when star parity is
  * total and meets t28 ALWAYS — the honest contract is the latter. */
class StreamingCurationE2ESpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val tmpDirs = scala.collection.mutable.Buffer.empty[String]

  override def afterAll(): Unit = {
    // the corpus copy is test-run scratch — remove it, deepest-first
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

  test("AvailableNow streaming tier finalizes to the batch t28 manifest") {
    // the prefix: the whole sf0.001 corpus with synthetic event times
    val batch = graft.Tables.documents(spark, sf)
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 100))
      .localCheckpoint()
    val srcDir = java.nio.file.Files.createTempDirectory("e2e_src").toString
    tmpDirs += srcDir
    batch.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)

    val legs = Seq(
      CurationStream.dedupe(stream, "ts", "1 hour")
        .writeStream.format("memory").queryName("e2e_dedup")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      StreamingNearDup.candidates(stream, "ts", "1 hour")
        .writeStream.format("memory").queryName("e2e_pairs")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      SketchStream.histogram(stream)
        .writeStream.format("memory").queryName("e2e_hist")
        .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start(),
      CurationStream.verdictSplit(stream)
        .writeStream.format("memory").queryName("e2e_verdict")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start())
    legs.foreach(_.awaitTermination())

    // leg parity 1: exact dedup kept one row per content hash
    val nHashes = batch
      .select(md5(graft.functions.TextAnalysis.normText(col("text"))))
      .distinct().count()
    assert(spark.table("e2e_dedup").count() === nHashes)

    // leg parity 2: the running histogram equals the batch histogram
    val gotHist = spark.table("e2e_hist")
      .as[(Long, Long)].collect().toSet
    val wantHist = SketchStream.histogram(batch)
      .as[(Long, Long)].collect().toSet
    assert(gotHist === wantHist && gotHist.nonEmpty)

    // finalize: CC over the accumulated candidate pairs (the batch
    // tier's own operator), then join the verdict leg into the
    // manifest shape
    val pairs = spark.table("e2e_pairs")
      .select(least(col("d1"), col("d2")).as("d1"),
        greatest(col("d1"), col("d2")).as("d2"))
      .distinct()
    assert(pairs.count() > 0) // parity must not be vacuous
    val nodes = batch.select(col("doc_id").as("id"))
    val cc = graft.ops.ConnectedComponents.labels(pairs, "d1", "d2",
      nodes, "id")
    val clusters = cc
      .select(col("id").as("doc_id"), col("label").as("cluster_id"),
        (col("id") === col("label")).as("is_keeper"))
    val got = spark.table("e2e_verdict")
      .join(clusters, "doc_id")
      .select(col("doc_id"), col("keep"), col("drop_reason"),
        col("cluster_id"), col("is_keeper"), col("split"),
        (col("keep") && col("is_keeper")).as("selected"))

    val cols = Seq("doc_id", "keep", "drop_reason", "cluster_id",
      "is_keeper", "split", "selected")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.map(col): _*)
      .collect()
      .map(r => cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("∅")).mkString("|"))
      .sorted.toSeq
    val want = TextQueries.t28CurationManifest.run(spark, sf)
    assert(rows(got) === rows(want))
  }
}

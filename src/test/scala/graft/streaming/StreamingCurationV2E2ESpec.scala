package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.functions.TextAnalysis
import graft.ops.DsirServe
import graft.queries.CurationQueries

/** The curation-v2 tier (t74 = Gopher rules ∧ line-dedup survival ∧
  * DSIR selection) exercised as one AvailableNow streaming pass — the
  * v2 twin of StreamingCurationE2ESpec. Four rule legs ride ONE
  * file-source read: the stateless Gopher battery (the gate's own
  * [[CurationQueries.gopherRules]] frame — one definition), the
  * frozen-model DSIR scorer ([[DsirServe.score]] — map-literal
  * projection), the line-dedup door
  * ([[StreamingLineDedup.survivors]]), and the stateless C4 battery
  * ([[CurationQueries.c4Rules]] — finalized against the batch t72b
  * gate, reassembly hash included); a further stateless projection
  * carries each doc's total line count. Finalization joins the legs
  * into t74's decision columns using a batch-frozen DSIR cut (the
  * (logw, doc_id) pair of the worst kept row — how a production
  * stream applies a batch quantile), and the result must EQUAL the
  * batch `t74_curation_v2` gate over the same corpus, row for row. */
class StreamingCurationV2E2ESpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val tmpDirs = scala.collection.mutable.Buffer.empty[String]

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

  test("AvailableNow streaming legs finalize to the batch t74 decision") {
    val docs = graft.Tables.documents(spark, sf)
    val batch = docs
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 100))
      .localCheckpoint()
    val srcDir = java.nio.file.Files.createTempDirectory("e2e2_src").toString
    tmpDirs += srcDir
    batch.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)

    // frozen artifacts from the batch tier: the DSIR model and the
    // selection cut (the worst kept row under (logw desc, doc_id))
    val model = DsirServe.train(docs, col("lang") === "en")
    val batchT74 = CurationQueries.t74CurationV2.run(spark, sf)
      .localCheckpoint()
    val batchT71 = CurationQueries.t71DsirWeights.run(spark, sf)
      .localCheckpoint()
    val Array(cutL, cutD) = batchT71.filter(col("kept"))
      .orderBy(col("logw_bits").asc, col("doc_id").desc).limit(1)
      .select(col("logw_bits"), col("doc_id"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head

    val legs = Seq(
      CurationQueries.gopherRules(stream)
        .select(col("doc_id"), col("keep"))
        .writeStream.format("memory").queryName("v2_gopher")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      DsirServe.score(stream, model)
        .select(col("doc_id"), col("logw_bits"))
        .writeStream.format("memory").queryName("v2_dsir")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      StreamingLineDedup.survivors(stream, "ts", "1 hour")
        .writeStream.format("memory").queryName("v2_lines")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      stream
        .select(col("doc_id"),
          size(TextAnalysis.chunkLines(TextAnalysis.tokens(col("text"))))
            .cast("long").as("n_lines"))
        .writeStream.format("memory").queryName("v2_nlines")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      // the C4 battery is stateless like the Gopher one — same frame
      // definition at the door as in the t72b gate
      CurationQueries.c4Rules(stream)
        .select(col("doc_id"), col("keep").as("c4_keep"),
          col("new_text_hash"))
        .writeStream.format("memory").queryName("v2_c4")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start())
    legs.foreach(_.awaitTermination())

    // the C4 leg finalizes to the batch t72b gate, reassembly hash
    // included (keep + the exact retained text, not just counts)
    val batchC4 = CurationQueries.t72bC4Rules.run(spark, sf)
      .select(col("doc_id"), col("keep"), col("new_text_hash"))
      .as[(Long, Boolean, String)].collect().toSet
    val gotC4 = spark.table("v2_c4")
      .select(col("doc_id"), col("c4_keep"), col("new_text_hash"))
      .as[(Long, Boolean, String)].collect().toSet
    assert(batchC4.exists(!_._2) && batchC4.exists(_._2)) // non-vacuous
    assert(gotC4 == batchC4)

    // finalize (publish-time batch over the leg tables)
    val kept = spark.table("v2_lines")
      .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
    val lineFrac = spark.table("v2_nlines")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_lines"))
          .as("kept_frac"))
    val decision = spark.table("v2_gopher")
      .select(col("doc_id"), col("keep").as("gopher_keep"))
      .join(spark.table("v2_dsir")
        .select(col("doc_id"),
          (col("logw_bits") > cutL ||
            (col("logw_bits") === cutL && col("doc_id") <= cutD))
            .as("dsir_kept")), Seq("doc_id"))
      .join(lineFrac, Seq("doc_id"))
      .select(col("doc_id"), col("gopher_keep"), col("kept_frac"),
        (col("kept_frac") >= 0.5).as("line_frac_ok"), col("dsir_kept"),
        (col("gopher_keep") && col("kept_frac") >= 0.5 && col("dsir_kept"))
          .as("selected"),
        when(!col("gopher_keep"), "gopher")
          .when(col("kept_frac") < 0.5, "boilerplate")
          .when(!col("dsir_kept"), "dsir").as("drop_reason"))

    def rows(df: org.apache.spark.sql.DataFrame)
        : Set[(Long, Boolean, Double, Boolean, Boolean, Boolean, String)] = df
      .select(col("doc_id"), col("gopher_keep"), col("kept_frac"),
        col("line_frac_ok"), col("dsir_kept"), col("selected"),
        coalesce(col("drop_reason"), lit("")).as("dr"))
      .as[(Long, Boolean, Double, Boolean, Boolean, Boolean, String)]
      .collect().toSet
    val got = rows(decision)
    val want = rows(batchT74)
    assert(want.exists(!_._6) && want.exists(_._6)) // non-vacuous
    assert(got == want)
  }
}

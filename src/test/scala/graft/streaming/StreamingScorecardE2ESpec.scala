package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.queries.{BpeQueries, ScorecardQueries, SketchQueries, TextQueries}

/** The t67 per-source scorecard produced by an AvailableNow STREAMING
  * run — the StreamingCurationE2ESpec pattern (one file-source read,
  * N legs, finalize) applied to the scorecard composition. Four legs
  * ride one streamed read of the sf0.001 corpus:
  *
  *  - the stateless per-doc verdict ([[CurationStream.verdictSplit]])
  *    — t66's keep/quality columns;
  *  - the band index ([[TextQueries.bandProjectionOf]] — a stateless
  *    projection; persisting it at the door IS the standing LSH
  *    index), finalized by the batch tier's own star-edge + CC
  *    operators into t66's dup-collapse column;
  *  - the running per-source HLL registers
  *    ([[SketchStream.hllRegisters]]) — t67's diversity column,
  *    estimated at publish time by the same factored arithmetic the
  *    t62 gate pins;
  *  - the running per-source token/unit mass
  *    ([[TokenizerStream.fertility]]) under the batch-trained merge
  *    model — t67's tokenizer-fit columns.
  *
  * Finalization joins the four into t67's row shape, and the result
  * must EQUAL the batch `t67_source_scorecard` over the same corpus,
  * row for row and cell for cell (every double comes off the same
  * expression trees). Unlike the t28 manifest spec, star parity is
  * exact here BY CONSTRUCTION: the streamed band set equals the batch
  * band set, and the finalize runs the identical
  * [[TextQueries.starEdgesOfBands]] hub election over it. */
class StreamingScorecardE2ESpec extends SparkSpec
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

  test("AvailableNow streaming legs finalize to the batch t67 scorecard") {
    val batch = graft.Tables.documents(spark, sf)
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 100))
      .localCheckpoint()
    val srcDir = java.nio.file.Files.createTempDirectory("sc_src").toString
    tmpDirs += srcDir
    batch.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)

    // the fertility leg's model: trained in the periodic BATCH tier
    // (the build/serve split) — the stream only applies it
    val merges = BpeQueries.trainMerges(spark, sf).orderBy("round").collect()

    val legs = Seq(
      CurationStream.verdictSplit(stream)
        .writeStream.format("memory").queryName("sc_verdict")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      TextQueries.bandProjectionOf(stream)
        .writeStream.format("memory").queryName("sc_bands")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start(),
      SketchStream.hllRegisters(stream)
        .writeStream.format("memory").queryName("sc_hll")
        .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start(),
      TokenizerStream.fertility(stream, merges)
        .writeStream.format("memory").queryName("sc_fert")
        .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start())
    legs.foreach(_.awaitTermination())

    // finalize leg 2: the batch tier's OWN star-edge + CC operators
    // over the accumulated band index (t66 composes on star clusters).
    // localCheckpoint materializes the accumulated state first — what
    // a real publish pass reads — and, mechanically, gives the hub
    // election's self-join a MultiInstanceRelation to clone (a memory
    // -sink View cannot appear on both sides of one join)
    val edges = TextQueries.starEdgesOfBands(
      spark.table("sc_bands").localCheckpoint())
    assert(edges.count() > 0) // parity must not be vacuous
    val nodes = batch.select(col("doc_id").as("id"))
    val cc = graft.ops.ConnectedComponents.labels(edges, "d1", "d2",
      nodes, "id")
    val clusters = cc.select(col("id").as("doc_id"),
      (col("id") === col("label")).as("is_keeper"))

    // t66's rollup over the verdict + cluster legs (source is an input
    // attribute of the arriving rows — joined back from the corpus)
    val curation = spark.table("sc_verdict")
      .select(col("doc_id"), col("keep"))
      .join(clusters, "doc_id")
      .join(batch.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("selected", col("keep") && col("is_keeper"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_quality_drop"),
        sum(when(col("keep") && !col("is_keeper"), 1L).otherwise(0L))
          .as("n_dup_drop"))
      .withColumn("sel_rate",
        col("n_selected").cast("double") / col("n_docs"))

    // publish-time arithmetic for the sketch + fertility legs — the
    // same factored expressions the batch gates pin
    val hll = SketchQueries.hllEstimateFrame(spark.table("sc_hll"), "source")
      .select(col("source"), col("est").as("distinct_3gram_est"))
    val fert = spark.table("sc_fert")
      .select(col("source"), col("n_tokens"),
        (col("n_units").cast("double") / col("n_tokens")).as("fertility"))

    val got = curation.join(fert, "source").join(hll, "source")
      .select(col("source"), col("n_docs"), col("n_selected"),
        col("n_quality_drop"), col("n_dup_drop"), col("sel_rate"),
        col("n_tokens"), col("fertility"), col("distinct_3gram_est"))

    val want = ScorecardQueries.t67SourceScorecard.run(spark, sf)
    val cols = Seq("source", "n_docs", "n_selected", "n_quality_drop",
      "n_dup_drop", "sel_rate", "n_tokens", "fertility",
      "distinct_3gram_est")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.map(col): _*)
      .collect()
      .map(r => cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("∅")).mkString("|"))
      .sorted.toSeq
    val gotRows = rows(got)
    assert(gotRows.nonEmpty)
    assert(gotRows === rows(want))
  }
}

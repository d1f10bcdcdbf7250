package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.queries.SketchQueries

/** Streaming-sketch parity: after each micro-batch, the Complete-mode
  * state equals the BATCH sketch of everything ingested so far —
  * exact counter equality (both sides are the same pure aggregation),
  * and the state never exceeds the sketch's cell bound. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming CMS state == batch sketch of the ingested prefix, at every batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = SketchStream.cmsCells(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toSeq
      val (a, b) = docs.splitAt(docs.size / 2)
      def batchCells(prefix: Seq[(Long, String)]) =
        SketchStream.cmsCells(prefix.toDF("doc_id", "text"))
          .as[(Int, Long, Long)].collect().toSet
      input.addData(a: _*); q.processAllAvailable()
      val afterA = spark.table("cms_stream")
        .as[(Int, Long, Long)].collect().toSet
      assert(afterA === batchCells(a)) // mid-stream prefix parity
      input.addData(b: _*); q.processAllAvailable()
      val afterB = spark.table("cms_stream")
        .as[(Int, Long, Long)].collect().toSet
      assert(afterB === batchCells(docs)) // full-corpus parity
      assert(afterB.size <= SketchQueries.CmsD * SketchQueries.CmsW)
    } finally q.stop()
  }

  test("streaming HLL registers == batch registers at every prefix; estimate finalizes identically") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = SketchStream.hllRegisters(
      input.toDF().toDF("source", "text"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("source"), col("text")).as[(String, String)]
        .collect().toSeq
      val (a, b) = docs.splitAt(docs.size / 2)
      def regsSet(df: org.apache.spark.sql.DataFrame) = df
        .select(col("source"), col("idx").cast("long"), col("m").cast("long"))
        .as[(String, Long, Long)].collect().toSet
      def batchRegs(prefix: Seq[(String, String)]) =
        regsSet(SketchStream.hllRegisters(prefix.toDF("source", "text")))
      input.addData(a: _*); q.processAllAvailable()
      val afterA = regsSet(spark.table("hll_stream"))
      assert(afterA === batchRegs(a)) // mid-stream prefix parity
      input.addData(b: _*); q.processAllAvailable()
      val afterB = regsSet(spark.table("hll_stream"))
      assert(afterB === batchRegs(docs)) // full-corpus parity
      // state bound: ≤ sources × m register rows
      val nSources = docs.map(_._1).distinct.size
      assert(afterB.size <= nSources * SketchQueries.HllM)
      // finalize: the snapshot's estimate arithmetic is the gate's own
      val est = SketchQueries.hllEstimate(
        spark.table("hll_stream").groupBy("idx").agg(max("m").as("m")))
      val exact = spark.read.parquet(s"$sf/documents.parquet")
        .select(explode(graft.functions.TextAnalysis.shingles(
          graft.functions.TextAnalysis.tokens(col("text")), 3)).as("s"))
        .distinct().count()
      assert(est > 0.5 * exact && est < 1.5 * exact,
        s"HLL estimate $est implausible vs exact $exact")
    } finally q.stop()
  }

  test("streaming histogram state == batch histogram; state bounded at B bins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = SketchStream.histogram(
      input.toDF().toDF("doc_id", "n_chars"))
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .collect().toSeq
      val (a, b) = docs.splitAt(docs.size / 3)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val got = spark.table("hist_stream")
        .as[(Long, Long)].collect().toSet
      val want = SketchStream.histogram(docs.toDF("doc_id", "n_chars"))
        .as[(Long, Long)].collect().toSet
      assert(got === want)
      assert(got.size <= SketchQueries.HistB)
    } finally q.stop()
  }
}

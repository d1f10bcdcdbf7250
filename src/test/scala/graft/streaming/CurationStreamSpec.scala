package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.functions.TextAnalysis

class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private case class Doc(doc_id: Long, text: String, ts: Timestamp)
  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("streaming dedup keeps one row per content hash; watermark attached") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val out = CurationStream.dedupe(docs, "ts", "10 minutes")
    assert(out.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      // same normal form under different surface forms → one hash;
      // the duplicate arrives in a LATER batch within the window and
      // must still be dropped (state carries across micro-batches)
      input.addData((1L, "Hello, World!", t(0)), (2L, "unrelated text", t(1)))
      q.processAllAvailable()
      input.addData((3L, "hello   world", t(2)), (4L, "third thing", t(3)))
      q.processAllAvailable()
      val got = spark.table("dedup").select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 4L)) // 3 deduped against 1's hash
    } finally q.stop()
  }

  test("streaming dedup over documents == batch distinct hash set") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 100).as("ts"))
    val expectHashes = batch
      .select(md5(TextAnalysis.normText(col("text"))).as("h"))
      .distinct().as[String].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val rows = batch.as[(Long, String, Timestamp)].collect().toSeq
    val q = CurationStream
      .dedupe(input.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode(OutputMode.Append).start()
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val got = spark.table("dedup_docs")
        .select("content_hash").as[String].collect()
      assert(got.length == got.distinct.length) // exactly one per hash
      assert(got.toSet == expectHashes) // same keeper set as batch T1
    } finally q.stop()
  }
}

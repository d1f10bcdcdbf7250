package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.queries.TextQueries

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("streaming near-dup candidates == batch t2 pair set over documents") {
    val sf = "/root/testdata/sf0.001"
    // batch ground truth: the real t2 operator (37 pairs at sf0.001)
    val expected = TextQueries.t2MinhashLsh.run(spark, sf)
      .select("d1", "d2", "sig_matches").as[(Long, Long, Int)]
      .collect().toSet
    assert(expected.nonEmpty) // parity must not be vacuous

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingNearDup.candidates(docs, "ts", "1 hour")
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1700000000L) + col("doc_id") % 100).as("ts"))
        .as[(Long, String, Timestamp)].collect().toSeq
      // two micro-batches: cross-batch pairs must come out of STATE
      val (a, b) = rows.splitAt(rows.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val got = spark.table("neardup")
        .select("d1", "d2", "sigMatches").as[(Long, Long, Int)]
        .collect().toSet // per-band re-emissions collapse in the set
      assert(got == expected)
    } finally q.stop()
  }

  test("bucket cap bounds accumulation; pairs still emit against early members") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    // cap 2: docs 1,2 fill every bucket; 3 and 4 (same text) match the
    // held members but are not retained, so (3,4) can never pair
    val q = StreamingNearDup.candidates(docs, "ts", "1 hour", bucketCap = 2)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode(OutputMode.Append).start()
    try {
      val txt = "the quick brown fox jumps over the lazy dog again and again"
      input.addData((1L, txt, t(0)), (2L, txt, t(1)))
      q.processAllAvailable()
      input.addData((3L, txt, t(2)), (4L, txt, t(3)))
      q.processAllAvailable()
      val got = spark.table("neardup_cap")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    } finally q.stop()
  }
}

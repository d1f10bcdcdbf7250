package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.functions.TextAnalysis

class StreamingLineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  /** t73's batch keeper set over a docs frame: per line-hash argmin by
    * pos-key (the gate's exact rule, rebuilt here over the same shared
    * chunkLines/linePosKey definitions). */
  private def batchKeepers(docs: org.apache.spark.sql.DataFrame) = {
    val h = docs
      .select(col("doc_id"),
        explode(TextAnalysis.chunkLines(TextAnalysis.tokens(col("text"))))
          .as("l"))
      .select(col("doc_id"), col("l.line_idx"),
        md5(col("l.line")).as("lh"),
        TextAnalysis.linePosKey(col("doc_id"), col("l.line_idx"))
          .as("pos_key"))
    val keep = h.groupBy("lh").agg(min("pos_key").as("k"))
    h.join(keep, Seq("lh")).filter(col("pos_key") === col("k"))
      .select("doc_id", "line_idx").as[(Long, Long)].collect().toSet
  }

  test("streaming survivors == batch t73 keeper set over an id-ordered prefix") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 120)
    val expected = batchKeepers(docs)
    assert(expected.nonEmpty)
    // parity must not be vacuous: the prefix must contain at least one
    // cross-document duplicate line (a dropped instance)
    val totalLines = docs
      .select(explode(TextAnalysis.chunkLines(TextAnalysis.tokens(col("text")))))
      .count()
    assert(expected.size < totalLines)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingLineDedup.survivors(stream, "ts", "1 hour")
      .writeStream.format("memory").queryName("linededup")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = docs
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
        .as[(Long, String, Timestamp)].collect().sortBy(_._1)
      // four micro-batches in doc_id order: cross-batch repeats must
      // be dropped out of STATE, not within-batch comparison
      rows.grouped(30).foreach { g =>
        input.addData(g: _*); q.processAllAvailable()
      }
      val got = spark.table("linededup")
        .select("doc_id", "line_idx").as[(Long, Long)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("within one micro-batch the lowest pos-key instance survives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingLineDedup.survivors(stream, "ts", "1 hour")
      .writeStream.format("memory").queryName("linededup_tie")
      .outputMode(OutputMode.Append).start()
    try {
      // ten identical tokens = one line each, same hash; both docs in
      // ONE batch — the survivor must be doc 3 (lowest pos-key), not
      // an arrival-order accident
      val line = Seq.fill(10)("dup").mkString(" ")
      input.addData((7L, line, t(0)), (3L, line, t(1)))
      q.processAllAvailable()
      val got = spark.table("linededup_tie")
        .select("doc_id", "line_idx").as[(Long, Long)].collect().toSet
      assert(got == Set((3L, 0L)))
    } finally q.stop()
  }

  test("a repeat after the watermark clears state falls through (two-tier contract)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingLineDedup.survivors(stream, "ts", "10 seconds")
      .writeStream.format("memory").queryName("linededup_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      val line = Seq.fill(10)("ttl").mkString(" ")
      input.addData((1L, line, t(0))); q.processAllAvailable()
      // advance the watermark far past the hash's timeout
      input.addData((2L, Seq.fill(10)("other").mkString(" "), t(3600)))
      q.processAllAvailable()
      // the SAME line re-arrives: its state was cleared, so it emits
      // again — the batch t73 sweep is the backstop that catches it
      input.addData((3L, line, t(3700))); q.processAllAvailable()
      val got = spark.table("linededup_ttl")
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L))
    } finally q.stop()
  }
}

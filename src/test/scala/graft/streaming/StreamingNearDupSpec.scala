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

  test("retention keeps the LOWEST ids: a full bucket evicts its largest for a smaller arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    // cap 1: id 10 fills the bucket; 5 probes it (pair 5,10) then
    // REPLACES it (5 < 10 — the t38b lowest-id rule); 11 must then
    // match the retained 5, not the evicted 10
    val q = StreamingNearDup.candidates(docs, "ts", "1 hour", bucketCap = 1)
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode(OutputMode.Append).start()
    try {
      val txt = "the quick brown fox jumps over the lazy dog again and again"
      input.addData((10L, txt, t(0))); q.processAllAvailable()
      input.addData((5L, txt, t(1))); q.processAllAvailable()
      input.addData((11L, txt, t(2))); q.processAllAvailable()
      val got = spark.table("neardup_evict")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(got == Set((5L, 10L), (5L, 11L)))
    } finally q.stop()
  }

  test("id-ordered stream at cap == the batch t38b-style capped index pair set") {
    val sf = "/root/testdata/sf0.001"
    val cap = 4 // small enough that sf0.001's dup families overflow it
    import graft.functions.TextAnalysis
    import org.apache.spark.sql.expressions.Window

    // batch reference: t38b's standing-index contract on ONE side —
    // cap lowest doc_ids per (band, bkey), candidates join each doc's
    // bands to the index at y < x, hits confirmed at >= K/2 matches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      TextAnalysis.minhashSignature(col("text")).as("sig")).localCheckpoint()
    val bands = sigs.select(col("doc_id"),
      posexplode(TextAnalysis.lshBandKeys(col("sig"))).as(Seq("band", "bkey")))
    val w = Window.partitionBy("band", "bkey").orderBy("doc_id")
    val idx = bands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap).drop("rn")
    val matches = aggregate(
      zip_with(col("s1"), col("s2"),
        (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    val expected = bands.as("a")
      .join(idx.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") > col("b.doc_id"))
      .select(col("b.doc_id").as("d1"), col("a.doc_id").as("d2")).distinct()
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
      .filter(matches >= TextAnalysis.MinhashK / 2)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty) // parity must not be vacuous

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingNearDup.candidates(stream, "ts", "1 hour",
        bucketCap = cap)
      .writeStream.format("memory").queryName("neardup_capped_parity")
      .outputMode(OutputMode.Append).start()
    try {
      // id-ordered arrival (ts increasing with id) across three
      // micro-batches — the regime where prefix retention equals the
      // batch capped index exactly
      val rows = docs.orderBy("doc_id")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .collect().toSeq
        .map { case (id, text) => (id, text, t(id)) }
      rows.grouped((rows.size + 2) / 3).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val got = spark.table("neardup_capped_parity")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(got == expected)
    } finally q.stop()
  }
}

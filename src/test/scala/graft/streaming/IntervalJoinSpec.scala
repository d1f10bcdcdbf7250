package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("attribution window: in-horizon matches only, state-bounded plan") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val out = IntervalJoin.attribute(
      pIn.toDF().toDF("p_id", "p_user", "p_ts"),
      cIn.toDF().toDF("c_id", "c_user", "c_ts"),
      delay = "1 minute", horizon = "10 seconds")
    assert(out.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
    val q = out.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append).start()
    try {
      // purchase at t=20 for user 1; clicks: t=12 (in horizon), t=5
      // (too old), t=25 (after purchase), and user 2's t=15 (other key)
      cIn.addData((101L, 1L, t(12)), (102L, 1L, t(5)),
        (103L, 1L, t(25)), (104L, 2L, t(15)))
      q.processAllAvailable()
      pIn.addData((1L, 1L, t(20)))
      q.processAllAvailable()
      val got = spark.table("attr").select("p_id", "c_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 101L)))
    } finally q.stop()
  }

  test("left outer: unmatched purchase emits nulls after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val q = IntervalJoin.attributeLeftOuter(
      pIn.toDF().toDF("p_id", "p_user", "p_ts"),
      cIn.toDF().toDF("c_id", "c_user", "c_ts"),
      delay = "5 seconds", horizon = "10 seconds")
      .select("p_id", "c_id")
      .writeStream.format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append).start()
    try {
      // purchase 1 matches a click; purchase 2 has none
      cIn.addData((101L, 1L, t(12)))
      pIn.addData((1L, 1L, t(20)), (2L, 9L, t(20)))
      q.processAllAvailable()
      // advance BOTH watermarks far past purchase 2's match window so
      // the unmatched row can be emitted
      cIn.addData((199L, 8L, t(1000)))
      pIn.addData((99L, 8L, t(1000)))
      q.processAllAvailable()
      cIn.addData((198L, 8L, t(2000)))
      pIn.addData((98L, 8L, t(2000)))
      q.processAllAvailable()
      val got = spark.table("attr_outer").select("p_id", "c_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(got.contains((1L, Some(101L))))
      assert(got.contains((2L, None)), s"unmatched purchase missing: $got")
    } finally q.stop()
  }

  test("streaming result == the same interval join run as a batch") {
    implicit val sqlCtx = spark.sqlContext
    // Tables.events canonicalizes ts to int64-ns whatever the parquet
    // physical type is (the raw read broke when testdata regenerated
    // from TIMESTAMP(NANOS) to TIMESTAMP(MICROS))
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("tsx", timestamp_micros(expr("ts DIV 1000")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("tsx").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("tsx").as("c_ts"))
    val expect = purchases.join(clicks,
      col("p_user") === col("c_user") && col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 6 hours"))
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    assert(expect.nonEmpty) // the fixture must actually exercise the join

    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val q = IntervalJoin.attribute(
      pIn.toDF().toDF("p_id", "p_user", "p_ts"),
      cIn.toDF().toDF("c_id", "c_user", "c_ts"),
      delay = "365 days", horizon = "6 hours")
      .select("p_id", "c_id")
      .writeStream.format("memory").queryName("attr_parity")
      .outputMode(OutputMode.Append).start()
    try {
      val pRows = purchases.as[(Long, Long, Timestamp)].collect().toSeq
      val cRows = clicks.as[(Long, Long, Timestamp)].collect().toSeq
      // split each side across two micro-batches: matches must form
      // across batch boundaries via buffered state
      val (c1, c2) = cRows.splitAt(cRows.size / 2)
      val (p1, p2) = pRows.splitAt(pRows.size / 2)
      cIn.addData(c1: _*); pIn.addData(p1: _*); q.processAllAvailable()
      cIn.addData(c2: _*); pIn.addData(p2: _*); q.processAllAvailable()
      val got = spark.table("attr_parity").as[(Long, Long)].collect().toSet
      assert(got == expect)
    } finally q.stop()
  }
}

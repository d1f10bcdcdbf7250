package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.multimodal.Multimodal

class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("streaming raster dedup: one survivor per decoded raster across formats and batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaStream.dedupeRaster(
      input.toDF().toDF("media_id", "content", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("media_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      // 40 arrivals over 10 rasters, PNG/BMP mixed, across two
      // micro-batches (cross-batch dups must be caught from STATE);
      // one undecodable blob must vanish, not fabricate an identity
      def rows(ks: Seq[Long]) = ks.map { k =>
        val fmt = if (k % 2 == 0) "png" else "bmp"
        (k, Multimodal.imageFixture(k % 10, 18, 16, fmt), t(k))
      }
      val (a, b) = rows(0L until 40L).splitAt(20)
      input.addData(a :+ ((99L, Array[Byte](1, 2, 3), t(50))): _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val kept = spark.table("media_dedup")
        .select("media_id").as[Long].collect().toSet
      // ONE survivor per raster group, drawn from that group — the
      // within-micro-batch winner is whichever row the state-store
      // task sees first (no ordering contract), so the spec pins the
      // dedup invariant, not an arrival-order accident
      assert(kept.size == 10)
      assert((0L until 10L).forall(g =>
        kept.count(id => id % 10 == g) == 1))
      // cross-batch dups were caught from state: batch two (ids 20-39)
      // contributed nothing new
      assert(kept.forall(_ < 20L))
    } finally q.stop()
  }
}

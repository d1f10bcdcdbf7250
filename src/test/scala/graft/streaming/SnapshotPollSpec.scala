package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotPollSpec extends SparkSpec {
  import spark.implicits._

  private val srcFile = "/root/testdata/sf0.001/events.parquet"

  /** FileStreamSource requires a directory; stage the read-only test
    * parquet into a temp dir. */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-events")
    Files.copy(Paths.get(srcFile), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("windowedStatus batch == streaming AvailableNow run") {
    // Batch ground truth over the same transform.
    val batch = SnapshotPoll.windowedStatus(
      spark.read.parquet(srcFile), "1 hour", "1 hour")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("window_start")) ->
        r.getAs[String]("last_status")).toMap
    assert(batch.nonEmpty)

    val roster = spark.range(0, 50).select(col("id").as("user_id"))
    val store = new SnapshotStore
    val q = SnapshotPoll.run(spark, streamDir, roster, store)
    q.awaitTermination(120000)
    assert(!q.isActive)

    // Streaming upsert converges to the batch snapshot (same keys, same
    // last-writer-wins values).
    assert(store.windows == batch)
    // Offline-fill: roster users with no events default to offline.
    val activeUsers = batch.keySet.map(_._1)
    val missing = (0L until 50L).toSet -- activeUsers
    assert(missing.forall(u => store.latest(u) == "offline"))
  }

  test("watermark is attached on the streaming plan (late-data bound)") {
    // Batch plans eliminate EventTimeWatermark; the structural check
    // must run on a streaming source.
    val stream = spark.readStream.schema(SnapshotPoll.EventsSchema)
      .parquet(streamDir)
    val plan = SnapshotPoll.windowedStatus(stream, "1 hour", "30 minutes")
      .queryExecution.analyzed.toString()
    assert(plan.contains("EventTimeWatermark"))
  }
}

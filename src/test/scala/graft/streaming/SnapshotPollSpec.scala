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

  test("sink retry idempotency: a replayed partition converges last-writer-wins") {
    // Simulated task retry: the same partition's rows stream through
    // upsertAll twice (and once more interleaved with a later batch's
    // values for overlapping keys) — the exactly-once-EFFECT claim in
    // the run() scaladoc is per-key idempotent convergence, pinned here.
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 01:00:00")
    val part1 = Seq((1L, t0) -> "login", (2L, t0) -> "view", (1L, t1) -> "error")
    val store = new SnapshotStore
    store.upsertAll(part1)
    val afterFirst = store.windows
    store.upsertAll(part1) // full replay, same epoch → no visible change
    assert(store.windows == afterFirst)
    assert(store.latest(1L) == "error" && store.latest(2L) == "view")

    // a later micro-batch updates an overlapping key, then THAT
    // partition replays too: last writer still wins, no duplication
    val part2 = Seq((1L, t1) -> "purchase", (3L, t1) -> "signup")
    store.upsertAll(part2)
    store.upsertAll(part2)
    assert(store.windows.size == 4) // keys, not write counts
    assert(store.windows((1L, t1)) == "purchase")
    assert(store.windows((1L, t0)) == "login")
    assert(store.latest(3L) == "signup")
  }

  test("watermark is attached on the streaming plan (late-data bound)") {
    // Batch plans eliminate EventTimeWatermark; the structural check
    // must run on a streaming source.
    val stream = spark.readStream
      .schema(SnapshotPoll.eventsSchema(spark, streamDir))
      .parquet(streamDir)
    val plan = SnapshotPoll.windowedStatus(stream, "1 hour", "30 minutes")
      .queryExecution.analyzed.toString()
    assert(plan.contains("EventTimeWatermark"))
  }
}

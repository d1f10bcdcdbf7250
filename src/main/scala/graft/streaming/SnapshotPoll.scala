package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming analogue of the reference's snapshot-poll pattern
  * (SURVEY.md §2.7). The reference has no streaming runtime — its
  * whole pipeline is a periodic re-poll of live devices where each run
  * snapshots time-varying status/alerts/toner, devices that do not
  * answer default to offline (toner_hp.py:63-66), and the result
  * replaces the previous document last-writer-wins
  * (printers_store.py:38-42). The faithful Structured Streaming
  * mapping, demonstrated on the `events` table:
  *
  *  - device poll results → an event stream (`readStream` over the
  *    snapshot directory; `Trigger.AvailableNow` = one catch-up run, the
  *    reference's batch re-poll cadence);
  *  - per-run snapshot → tumbling window; the per-device status is the
  *    LATEST event in the window (max_by over event time);
  *  - timeout / late answers → watermark: events later than the bound
  *    are dropped exactly like a poll answer arriving after the run;
  *  - devices missing from a window → offline-fill at the sink (left
  *    join against the roster in foreachBatch);
  *  - last-writer-wins document replace → foreachBatch keyed upsert
  *    (MERGE shape: new window rows overwrite the key's previous row).
  *
  * Scale: the only stateful operator is the windowed aggregation, keyed
  * (window, user) — state size = active keys per window, bounded by the
  * watermark horizon; the sink upsert is idempotent per (key, window),
  * so retries are safe (exactly-once effect with a transactional sink).
  */
object SnapshotPoll {

  /** Schema for streaming reads of an events directory: one batch
    * footer read. `readStream` requires an explicit schema, and the
    * physical type of `ts` has varied across testdata generations
    * (int64-ns under nanosAsLong vs TIMESTAMP_NTZ from a MICROS file) —
    * inferring from the footer keeps the stream robust to both;
    * [[windowedStatus]] then canonicalizes `ts` via
    * [[graft.Tables.tsNanos]]. */
  def eventsSchema(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(dir).schema

  /** `ts` is canonical int64 nanoseconds (see [[graft.Tables.tsNanos]]);
    * event-time operators need a real timestamp.
    * Integer `div`, not `/`: ns epochs exceed double's 53-bit mantissa
    * and float division corrupts the low microseconds. */
  def eventTime(tsNanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros((tsNanos.cast("decimal(20,0)") / lit(1000)).cast("long"))

  /** Core transform, identical for batch and streaming inputs: tumbling
    * per-device window → latest event wins (max_by on event time, the
    * deterministic "last answer in this poll run"), plus activity
    * stats. First canonicalizes `ts` to int64-ns whatever the source's
    * physical type resolved to. */
  def windowedStatus(events: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame =
    events
      .withColumn("ts", graft.Tables.tsNanos(events.schema("ts").dataType, col("ts")))
      .withColumn("etime", eventTime(col("ts")))
      .withWatermark("etime", watermarkDelay)
      .groupBy(window(col("etime"), windowDur).as("w"), col("user_id"))
      .agg(
        max_by(col("event_type"), col("ts")).as("last_status"),
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("user_id"),
        col("last_status"), col("n_events"), col("sum_value"))

  /** One poll run over a snapshot directory: AvailableNow micro-batches,
    * executor-side keyed upsert (foreachPartition — the micro-batch
    * never lands on the driver) with offline-fill for roster devices
    * that produced no events. Returns the started query (caller awaits
    * termination).
    *
    * Sink shape: the closure captures only the store's registry id; each
    * partition resolves its writer and streams rows through it — the
    * MERGE INTO / connection-per-partition seam. Windowed state size is
    * an executor concern, never driver memory. The roster, by contrast,
    * is the small bounded dimension (the reference's device list) and
    * stays a driver-side collect by design. */
  def run(spark: SparkSession, eventsDir: String, roster: DataFrame,
      store: SnapshotStore, windowDur: String = "1 hour",
      watermarkDelay: String = "1 hour"): StreamingQuery = {
    val stream = spark.readStream.schema(eventsSchema(spark, eventsDir))
      .parquet(eventsDir)
    val agg = windowedStatus(stream, windowDur, watermarkDelay)
    val rosterRows = roster.select(col("user_id").cast("long")).collect()
      .map(_.getLong(0))
    val storeId = SnapshotStore.register(store)
    agg.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Last-writer-wins upsert per (user, window), partition-parallel
        // on the executors; idempotent per key, so task retries are safe.
        batch.foreachPartition { (it: Iterator[Row]) =>
          val sink = SnapshotStore.resolve(storeId) // per-partition writer open
          sink.upsertAll(it.map { r =>
            (r.getAs[Long]("user_id"),
              r.getAs[java.sql.Timestamp]("window_start")) ->
              r.getAs[String]("last_status")
          })
        }
        // offline-fill: roster keys never seen get the reference's
        // unreachable default (toner_hp.py:63-66) — driver-side over the
        // small roster only
        store.fillMissing(rosterRows, "offline")
        ()
      }
      .start()
  }
}

/** Minimal keyed sink for tests/demos: thread-safe last-writer-wins
  * map keyed (user_id, window_start) + per-user latest status. A
  * production sink would be a Delta/Iceberg MERGE INTO or a JDBC
  * upsert — `resolve` is where a cluster deployment would open the
  * external connection instead of returning the in-JVM map (in
  * local[n], executors share the JVM, so the registry IS the store). */
final class SnapshotStore {
  private val m =
    scala.collection.concurrent.TrieMap.empty[(Long, java.sql.Timestamp), String]
  private val seen = scala.collection.concurrent.TrieMap.empty[Long, String]

  def upsertAll(kvs: IterableOnce[((Long, java.sql.Timestamp), String)]): Unit =
    kvs.iterator.foreach { case (k, v) => m.put(k, v); seen.put(k._1, v) }

  def fillMissing(roster: Seq[Long], default: String): Unit =
    roster.foreach(u => seen.putIfAbsent(u, default))

  def latest: Map[Long, String] = seen.toMap
  def windows: Map[(Long, java.sql.Timestamp), String] = m.toMap
}

/** JVM-local registry so executor closures carry an id, not the store:
  * the foreachPartition lambda stays serializable-by-construction and
  * the external-writer swap point is a single method. */
object SnapshotStore {
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, SnapshotStore]
  private val ids = new java.util.concurrent.atomic.AtomicLong(0L)

  def register(s: SnapshotStore): String = {
    val id = s"store-${ids.incrementAndGet()}"
    registry.put(id, s)
    id
  }

  def resolve(id: String): SnapshotStore = registry(id)
}

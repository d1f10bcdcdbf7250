package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet tables (TESTDATA.md). Plain
  * `spark.read.parquet` so Catalyst owns pushdown/pruning — every query
  * should show `PushedFilters`/pruned `ReadSchema` in `.explain`. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonical-ns rewrite for an event-time column: whatever the parquet
    * physically carries, downstream code sees int64 epoch NANOSECONDS
    * and does exact integer arithmetic (ns epochs ~1.7e18 exceed
    * double's 53-bit mantissa, so float math is never safe on them).
    *
    *  - TIMESTAMP(NANOS) files surface as [[LongType]] under
    *    `spark.sql.legacy.parquet.nanosAsLong` (Sessions) — already
    *    canonical, passthrough;
    *  - TIMESTAMP(isAdjustedToUTC=false) files surface as
    *    TIMESTAMP_NTZ. NTZ is a wall-clock with no instant, and
    *    `unix_micros` takes TIMESTAMP, so the cast to TIMESTAMP comes
    *    first — it reinterprets the wall-clock in the SESSION timezone.
    *    Sessions pins `spark.sql.session.timeZone=UTC`, making the cast
    *    the identity reinterpretation whose `unix_micros` equals the
    *    file's raw int64 µs — exactly what the nanos path reads ÷1000.
    *    (A non-UTC session would shift the epoch; the engine pins UTC
    *    precisely so event-time math is tz-free.)
    *  - TIMESTAMP (instant) needs no cast: `unix_micros` directly.
    *
    * Scale note: the rewrite replaces the physical column with an
    * expression, so a filter against canonical ns is evaluated
    * post-scan rather than pushed to parquet row-group stats. At 100 TB
    * event-time selectivity comes from partition pruning over the
    * date-partitioned layout (directory-level, unaffected by this
    * rewrite), so nothing is lost where it matters. */
  def tsNanos(physical: DataType, ts: Column): Column = physical match {
    case LongType         => ts
    case TimestampNTZType => unix_micros(ts.cast(TimestampType)) * lit(1000L)
    case TimestampType    => unix_micros(ts) * lit(1000L)
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported physical type $other " +
        "(expected int64-ns, TIMESTAMP, or TIMESTAMP_NTZ)")
  }

  /** Single-row-group guard (r20, guide §2.5 "input skew" / §6): the
    * driver's testdata ships each table as ONE parquet row group, so
    * every scan is one task and every scan-local stage (tokenize, md5,
    * shingle windows, vector scaling) runs on one core of the host.
    * Below [[SpreadMaxBytes]] the loader repartitions by the table's
    * key to the scheduler's parallelism — a shuffle of the (tiny) file
    * that buys back the machine. At lake scale files carry many row
    * groups, the scan is already parallel, and the gate is off by
    * construction, so no production plan ever pays a corpus shuffle.
    * Filters/pruning still reach the scan: Catalyst pushes both
    * through RepartitionByExpression. */
  private val SpreadMaxBytes = 256L << 20
  // keyed on (path, mtime) so an in-process rewrite of the backing
  // parquet re-evaluates the gate (ADVICE r20 — the Clustering
  // fingerprint discipline applied to the size probe)
  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.Long]()
  private def spread(s: SparkSession, d: String, name: String,
      df: DataFrame, key: Column): DataFrame = {
    val path = s"$d/$name.parquet"
    val hp = new org.apache.hadoop.fs.Path(path)
    val (mtime, fsOpt) =
      try {
        val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        (fs.getFileStatus(hp).getModificationTime, Some(fs))
      } catch { case _: Throwable => (0L, None) }
    val bytes = sizeCache.computeIfAbsent((path, mtime), { _ =>
      try {
        java.lang.Long.valueOf(fsOpt.get.getContentSummary(hp).getLength)
      } catch { case _: Throwable => java.lang.Long.valueOf(Long.MaxValue) }
    })
    if (bytes < SpreadMaxBytes)
      df.repartition(s.sparkContext.defaultParallelism, key)
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events` with `ts` normalized to canonical int64-ns (see
    * [[tsNanos]]) — the driver's testdata has shipped both
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) physical types across
    * regenerations; every consumer keeps identical semantics under
    * either. */
  // events are NOT spread (r21, measured — VERDICT r20 item 2): every
  // events consumer does trivial per-row work (pivots, argmax windows,
  // dedup elections — no tokenize/md5 mass), so the spread's exchange
  // + 32-task fixed cost bought nothing and cost the whole tier
  // 1.2–2× at 32 cores (a1 0.33→0.64, s1 0.34→0.66, x4 0.23→0.61 …,
  // ≈3–4 s across the tier, driver-confirmed r20 and re-measured this
  // round); at 8 cores the tier sat back at anchor level — per-task
  // overhead, not compute. The documents spread stays: its consumers'
  // scan-local tokenize/md5 stages are exactly the heavy mass the
  // spread exists for.
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.withColumn("ts", tsNanos(raw.schema("ts").dataType, col("ts")))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    spread(s, d, "documents", apply(s, d, "documents"), col("doc_id"))
  // embeddings are NOT spread (r20, measured): the vector tier's heavy
  // work (candidate scoring) sits AFTER exchanges that already
  // parallelize it, while its iterative gates run dozens of tiny
  // stages whose per-task overhead a 32-way scan multiplies — the
  // bench showed every embeddings consumer 0.7–2.3 s SLOWER spread
  // (t84/t85/t65/t26) and none faster. Scan-local embedding work is
  // 64 scalar ops per row; the text tier's md5/tokenize mass is what
  // the spread exists for.
  def embeddings(s: SparkSession, d: String): DataFrame =
    apply(s, d, "embeddings")
}

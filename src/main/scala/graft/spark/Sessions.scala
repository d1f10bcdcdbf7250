package graft.spark

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify / Bench / tests agree.
  *
  * Scale notes (100 TB design intent, tested on local[32]):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join
  *    splitting replaces hand-tuned partition counts per query.
  *  - `shuffle.partitions` defaults to the local core count; on a real
  *    cluster this is overridden (or AQE's coalescing makes it moot).
  *  - `parquet.nanosAsLong`: a TIMESTAMP(NANOS) `events` file surfaces
  *    as an ns-epoch long (Spark would otherwise refuse NANOS). The
  *    engine's canonical `ts` is int64 nanoseconds (exact, tz-free);
  *    `Tables.tsNanos` normalizes whatever physical type the file
  *    actually carries (the driver's testdata has shipped both NANOS
  *    and MICROS), relying on `session.timeZone=UTC` below for the
  *    TIMESTAMP_NTZ reinterpretation to be epoch-exact.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      // the engine's custom expressions (generators, long_dot, bloom)
      // install at session build — the idiomatic cluster deployment of
      // spark.sql.extensions, so every session (Verify/Bench/tests)
      // sees the same SQL surface
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Standard local session for mains/tests. */
  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

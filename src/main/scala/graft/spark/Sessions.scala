package graft.spark

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify / Bench / tests agree.
  *
  * Scale notes (100 TB design intent, tested on local[32]):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join
  *    splitting replaces hand-tuned partition counts per query.
  *  - `shuffle.partitions` defaults to the local core count; on a real
  *    cluster this is overridden (or AQE's coalescing makes it moot).
  *  - `parquet.nanosAsLong`: the `events` table carries TIMESTAMP(NANOS)
  *    which Spark's vectorized reader surfaces as an ns-epoch long; all
  *    engine code treats `ts` as int64 nanoseconds (exact, tz-free).
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
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

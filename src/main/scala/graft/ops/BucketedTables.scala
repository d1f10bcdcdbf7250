package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-located joins — the storage-layout half of the
  * 100 TB join story.
  *
  * A fact⋈fact join (j3's id-map upsert against a fleet snapshot,
  * t38's per-ingest probe of the corpus band index) pays a full
  * shuffle of BOTH sides every run: at 100 TB that is the dominant
  * cost, and it repeats on every pipeline execution. Writing both
  * sides bucketed by the join key moves that shuffle to WRITE time,
  * once: `bucketBy(n, key)` hash-partitions rows into n files per
  * write task and records the bucketing in the catalog, after which
  * every equi-join (and aggregation) on the key between tables with
  * matching bucket counts plans with ZERO Exchange operators — the
  * scan itself satisfies the join's distribution requirement.
  *
  * This is the standing-index contract the incremental operators
  * assume: the corpus side of t38 is written bucketed by its band
  * key at ingest N, and ingest N+1's probe join shuffles only the
  * (small) batch side. The cost model is
  * `write-once shuffle + k × shuffle-free joins` versus
  * `k × (shuffle both sides)` — the former wins for any table joined
  * more than once on the same key, which is what "index" means.
  *
  * Bucket-count discipline at scale: pick n so a bucket's largest
  * file fits an executor's read slice (Spark joins tables with
  * DIFFERENT bucket counts by shuffling the smaller-bucketed side
  * unless one count divides the other), and bucket by the HIGH-NGRAM
  * join key, not a low-cardinality column — a 16-bucket table with a
  * dominant key is the skew problem again, at rest (see SaltedJoin
  * for the in-flight answer).
  */
object BucketedTables {

  /** Write `df` as a parquet table bucketed (and sorted) by `keys` —
    * the one-time shuffle that buys every later join on them.
    *
    * Replacement is STAGED: the new data lands in a `__staging` table
    * first and only a successful write swaps it in, so a failed write
    * (disk full, executor loss) leaves the previous standing index
    * intact — destroying the index a pipeline amortizes its cost over
    * is precisely the failure this op must not have. The swap itself
    * is rename-only (live → `__old`, staging → live, drop `__old`):
    * at every instant the previous index exists under SOME name, so a
    * crash mid-swap is recoverable by renaming `__old` back — there
    * is no window in which data files are deleted before the
    * replacement is live. Also clears ORPHANED managed locations left
    * by a process whose in-memory catalog died without dropping its
    * tables (overwrite alone cannot: the new catalog doesn't know the
    * table, so CREATE refuses the existing path). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: String*): Unit = {
    val spark = df.sparkSession
    val staging = table + "__staging"
    val old = table + "__old"
    dropWithLocation(spark, staging)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(staging)
    // the write succeeded — swap via renames; the live index is never
    // deleted until its replacement is installed
    dropWithLocation(spark, old)
    if (spark.catalog.tableExists(table))
      spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    else dropWithLocation(spark, table) // no live index — only clear orphans
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    dropWithLocation(spark, old)
  }

  /** DROP TABLE IF EXISTS plus removal of the default managed location
    * if a prior catalog's death orphaned it. */
  private def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val path = new org.apache.hadoop.fs.Path(loc)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Equi-join two tables on `key`. When both were written via
    * [[writeBucketed]] with the same bucket count, the planned join
    * has no Exchange on either side (assert it with
    * [[isShuffleFreeJoin]] — plan contracts, not hope). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True when `df`'s planned physical tree contains a join and no
    * SHUFFLE exchange — the property bucketing exists to buy. A
    * BroadcastExchange does not count: broadcast joins are shuffle-free
    * with or without bucketing. Checked on the static plan: bucketed
    * scan distribution is a planning-time property, and AQE never adds
    * an exchange the static plan didn't need. */
  def isShuffleFreeJoin(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("Join") && !p.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
  }
}

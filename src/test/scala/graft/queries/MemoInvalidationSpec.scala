package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Pins the Clustering memo's staleness contract: keys carry a content
  * fingerprint of the backing parquet, so an input dir rewritten
  * in-process misses the memo and rebuilds instead of serving the old
  * checkpointed frame. */
class MemoInvalidationSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint changes when the backing parquet is rewritten") {
    val dir = Files.createTempDirectory("graft-memo").toString
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f1 = Clustering.fingerprint(dir, "documents")
    assert(f1.nonEmpty)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val f2 = Clustering.fingerprint(dir, "documents")
    assert(f1 != f2, "rewriting the table must change the fingerprint")
    // stable when nothing changed
    assert(f2 == Clustering.fingerprint(dir, "documents"))
  }

  test("winnow fingerprint memo invalidates on corpus rewrite") {
    // t61 composes on the memoized winnowing frame; after an in-process
    // rewrite of documents.parquet the pair set must track the NEW
    // corpus, not the stale checkpoint
    val dir = Files.createTempDirectory("graft-winnow-memo").toString
    val textA =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    Seq((1L, textA), (2L, textA)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r1 = TextQueries.t61WinnowPairs.run(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq
    assert(r1 == Seq((1L, 2L)), "identical docs must pair")
    Seq((1L, textA),
        (3L, "one two three four five six seven eight nine ten els twl"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r2 = TextQueries.t61WinnowPairs.run(spark, dir).collect()
    assert(r2.isEmpty, "rewritten corpus has no pairs — stale memo served?")
  }

  test("memo reuses only under a matching stamp; a new stamp rebuilds") {
    val m = new Clustering.Memo[String]
    val recorded = spark.range(1).toDF("a")
    m.record("prefix", "fp-old", recorded)
    assert(m.reuse("prefix", "fp-old")(sys.error("must not rebuild"))
      eq recorded)
    var built = false
    val fresh = spark.range(2).toDF("a")
    val got = m.reuse("prefix", "fp-new") { built = true; fresh }
    assert(built, "a changed stamp (rewritten input) must rebuild")
    assert(got eq fresh)
    // an unknown prefix rebuilds too
    var built2 = false
    m.reuse("other-prefix", "fp-old") { built2 = true; fresh }
    assert(built2)
  }

  test("re-recording a prefix releases the superseded checkpoint's blocks (ADVICE r14)") {
    def checkpointRdd(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        case other => fail(s"expected LogicalRDD, got ${other.getClass}")
      }
    val m = new Clustering.Memo[String]
    val old = spark.range(10).toDF("a").localCheckpoint()
    val oldRdd = checkpointRdd(old)
    assert(oldRdd.getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE,
      "localCheckpoint must have persisted its RDD")
    m.record("prefix", "fp-1", old)
    // same frame re-recorded: NOT released (record must be idempotent)
    m.record("prefix", "fp-1", old)
    assert(oldRdd.getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
    // a replacing record (rewrite OR direct-run re-record) releases it
    val fresh = spark.range(20).toDF("a").localCheckpoint()
    m.record("prefix", "fp-2", fresh)
    assert(oldRdd.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "superseded checkpoint must be unpersisted, not orphaned")
    // the replacement still serves
    assert(m.reuse("prefix", "fp-2")(sys.error("must not rebuild"))
      eq fresh)
    assert(checkpointRdd(fresh).getStorageLevel !=
      org.apache.spark.storage.StorageLevel.NONE)
  }
}

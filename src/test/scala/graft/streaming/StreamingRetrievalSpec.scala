package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.queries.SearchQueries

/** The retrieval door's parity contract (VERDICT r17 item 4): an
  * AvailableNow streaming ingest appends per-batch postings +
  * doc-length deltas to standing tables; the publish-time finalize
  * over those tables must equal BOTH batch retrieval gates — t53's
  * BM25 top-k AND t80's RRF fusion — row for row over the same corpus
  * (all output cells are integers, so parity is exact, not
  * approximate). The source is split into multiple files with
  * maxFilesPerTrigger=1, so the door genuinely accumulates across
  * micro-batches rather than seeing the corpus in one. Every batch's
  * delta write is issued TWICE with the same batchId — the
  * at-least-once replay foreachBatch can deliver — so the parity
  * asserts also pin the door's idempotence contract (a retried batch
  * must replace, not re-append, its deltas). */
class StreamingRetrievalSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private val tmpDirs = scala.collection.mutable.Buffer.empty[String]

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toString
    tmpDirs += d
    d
  }

  override def afterAll(): Unit = {
    tmpDirs.foreach { dir =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    super.afterAll()
  }

  test("standing postings finalize equals batch t53 AND t80 row-for-row") {
    val batch = graft.Tables.documents(spark, sf).localCheckpoint()
    val srcDir = tmp("rs_src")
    batch.repartition(4).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)

    val postingsDir = tmp("rs_postings")
    val dlenDir = tmp("rs_dlen")
    var batches = 0
    val q = stream.writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val bb = b.localCheckpoint() // one source read feeds both writes
        // written TWICE per batch: the second call is the retry
        // simulation — dynamic partition overwrite must land the
        // replay on top of the first write, not beside it
        RetrievalStream.writePostingsDelta(bb, id, postingsDir)
        RetrievalStream.writePostingsDelta(bb, id, postingsDir)
        RetrievalStream.writeDocLengthDelta(bb, id, dlenDir)
        RetrievalStream.writeDocLengthDelta(bb, id, dlenDir)
        batches += 1
      }.start()
    q.awaitTermination()
    assert(batches >= 4, s"expected one batch per file, got $batches")

    // the standing tables after ingest: localCheckpoint materializes
    // what a publish pass reads (and keeps the two finalize runs from
    // re-listing the append dirs)
    val tc = RetrievalStream.standing(spark, postingsDir).localCheckpoint()
    val dlen = RetrievalStream.standing(spark, dlenDir).localCheckpoint()
    // exactly one length row and one posting row set per document —
    // the per-batch deltas really were final AND the doubled writes
    // really replaced (not re-appended): no doc split or repeat
    assert(dlen.count() == batch.count())
    assert(tc.groupBy("doc_id", "word").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    // t53 parity: ranked lists identical cell-for-cell, in rank order
    assert(rows(RetrievalStream.finalizeBm25(dlen, tc)) ==
      rows(SearchQueries.t53Bm25TopK.run(spark, sf)))
    // t80 parity: the fused lists and both legs' audit ranks identical
    assert(rows(RetrievalStream.finalizeRrf(dlen, tc)) ==
      rows(SearchQueries.t80RrfFusion.run(spark, sf)))
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.BucketedTables

/** The retrieval door's LAKE-SCALE layout contract (VERDICT r18 item
  * 4), asserted instead of claimed: RetrievalStream's scaladoc says
  * the standing postings table is written bucketed by `word` so every
  * publish-time df aggregate reads it shuffle-free. This spec writes
  * the door's postings output through [[BucketedTables]] and pins
  * (1) the postings-side df aggregate plans with ZERO Exchange over
  * the bucketed table (and with one over plain parquet — the repeated
  * cost bucketing converts to write-once), (2) the full t53/t80
  * finalize over the bucketed table drops postings-side exchanges
  * while staying row-for-row equal to the plain-layout finalize. */
class BucketedPostingsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalized(df: DataFrame): String = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def hashExchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  test("bucketed standing postings: shuffle-free df aggregate, finalize parity") {
    val docs = graft.Tables.documents(spark, sf)
    val tc = RetrievalStream.postingsDelta(docs).localCheckpoint()
    val dlen = RetrievalStream.docLengthDelta(docs).localCheckpoint()
    BucketedTables.writeBucketed(tc, "standing_postings_spec", 8, "word")
    val bt = spark.table("standing_postings_spec")

    // (1) the publish-time df aggregate — the postings-side pass every
    // publish pays — needs NO exchange off the bucketed scan: the
    // word-bucketed layout satisfies the aggregate's distribution
    def dfAgg(t: DataFrame) = t.groupBy("word")
      .agg(count_distinct(col("doc_id")).as("df"))
    val pB = finalized(dfAgg(bt))
    assert(pB.contains("Bucketed: true"), s"scan not bucketed:\n$pB")
    assert(hashExchanges(pB) == 0, s"df aggregate still shuffles:\n$pB")
    val pP = finalized(dfAgg(tc))
    assert(hashExchanges(pP) >= 1,
      s"plain layout unexpectedly shuffle-free (vacuous contrast):\n$pP")

    // (2) the whole finalize: fewer exchanges bucketed (exactly the
    // postings-side ones gone — the tail's query_id exchanges remain),
    // and identical published rankings either layout
    def rows(df: DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    val exPlainB = hashExchanges(finalized(RetrievalStream.finalizeBm25(dlen, tc)))
    val exBktB = hashExchanges(finalized(RetrievalStream.finalizeBm25(dlen, bt)))
    assert(exBktB < exPlainB,
      s"bucketed finalize did not drop an exchange: $exBktB vs $exPlainB")
    assert(rows(RetrievalStream.finalizeBm25(dlen, bt)) ==
      rows(RetrievalStream.finalizeBm25(dlen, tc)))
    assert(rows(RetrievalStream.finalizeRrf(dlen, bt)) ==
      rows(RetrievalStream.finalizeRrf(dlen, tc)))
  }
}

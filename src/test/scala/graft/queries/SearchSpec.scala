package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis.tokens

/** BM25 contracts beyond the t53 oracle row: rank-order coherence,
  * retrieval soundness (every hit contains a query term), and the
  * per-term score ceiling the saturation form guarantees. */
class SearchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t53: ranks are score-ordered, bounded, and hits contain terms") {
    val out = SearchQueries.t53Bm25TopK.run(spark, sf).localCheckpoint()
    // ≤ TopK rows per query, rank dense from 1
    val perQ = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
    assert(perQ.nonEmpty)
    perQ.foreach { r =>
      assert(r.getAs[Long]("n") <= SearchQueries.TopK)
      assert(r.getAs[Long]("mx") === r.getAs[Long]("n"))
    }
    // scores non-increasing in rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rank")
    assert(out.withColumn("prev", lag("score_u", 1).over(w))
      .filter(col("prev").isNotNull && col("score_u") > col("prev"))
      .count() === 0)
    // whole-bit idf is never negative (df ≤ N), so scores aren't
    // either — but they CAN be exactly 0 when a query term's df sits
    // in N's bit-band (observed: sf0.001 query 1), so no positivity
    assert(out.filter(col("score_u") < 0).count() === 0)
    val ti = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    // reconstruct the query terms exactly as the operator derives them
    val df = ti.filter(col("word") =!= "")
      .groupBy("word").agg(count_distinct(col("doc_id")).as("df"))
      .orderBy(col("df").asc, col("word"))
      .limit(SearchQueries.QTermRanks.max)
      .collect().zipWithIndex
      .map { case (r, i) => (i / 2, r.getString(0)) } // (query_id, word)
    import spark.implicits._
    val qterms = df.toSeq.toDF("query_id", "word")
    val hits = out.join(ti, "doc_id")
      .join(qterms, Seq("query_id", "word"))
      .select("query_id", "doc_id").distinct()
    assert(out.select("query_id", "doc_id").distinct().count() ===
      hits.count(), "a ranked doc contains none of its query terms")
  }
}

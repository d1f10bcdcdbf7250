package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactNum
import graft.functions.TextAnalysis.tokens

/** BM25 lexical retrieval over `documents` (Robertson & Walker's
  * Okapi BM25) — the data-exploration door of a curation stack:
  * "show me the documents about X" against 100 TB is a ranked
  * retrieval, and BM25 is its standard scorer.
  *
  * Query set: data-derived and deterministic — the document-frequency
  * ranking picks the [[QTermRanks]] RAREST terms (head terms match
  * every doc and rank nothing; rare terms are what retrieval
  * discriminates on), paired into two-term queries. A real deployment
  * feeds user queries through the same scorer; the operator under
  * test is the scoring join, not the query source.
  *
  * Float discipline: idf is WHOLE-BIT (bitlen(N)−bitlen(df) — t48's
  * integer floor(log2), no libm); the tf/length factor is a fixed
  * parenthesized chain of correctly-rounded double ops mirrored
  * token-for-token in the oracle SQL, quantized per (term, doc) to a
  * micro-unit long through [[ExactNum]] — so the per-doc SUM across
  * query terms is an associative integer sum, never a float sum.
  *
  * Scale shape: the postings build is one tokenize+explode with the
  * probe terms semi-joined in BEFORE the tf aggregation (broadcast of
  * a handful of terms — the scan never materializes full postings for
  * terms nobody asked about); doc length and the N/avgdl scalars ride
  * broadcasts. Per query the final top-k is a window over only the
  * docs containing ≥1 query term.
  *
  * Corpus caveat (measured): the synthetic template vocabulary is
  * nearly flat — one genuinely rare word exists, the rest have
  * df ≈ N — so whole-bit idf zeroes most terms' contributions and
  * only the rare-term query ranks non-trivially. The gate pins the
  * scoring path's parity and ordering; score-magnitude realism needs
  * a Zipf corpus. */
object SearchQueries {

  private val K1 = 1.2
  private val B = 0.75

  /** df-ASCENDING ranks (1-based, rarest first) used as query terms,
    * paired in order: (1,2) → query 0, (3,4) → query 1. Rare terms are
    * what retrieval discriminates on — and under whole-bit idf
    * (bitlen(N)−bitlen(df)) they're the only terms whose idf is
    * nonzero on this corpus: the synthetic template vocabulary is ~31
    * words, so head terms have df ≈ N and floor(log2(N/df)) = 0. */
  private[queries] val QTermRanks = Seq(1, 2, 3, 4)
  private[queries] val TopK = 10

  val t53Bm25TopK: QuerySpec = {
    import TextQueries.ToksSql
    val ranksIn = QTermRanks.mkString("(", ", ", ")")
    QuerySpec.sql(
      "t53_bm25_topk",
      s"""WITH t AS (SELECT doc_id,
         |    list_filter($ToksSql, x -> x <> '') AS toks FROM documents),
         |d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM t),
         |ti AS (SELECT doc_id, dl, unnest(toks) AS word FROM d),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM d),
         |df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM ti GROUP BY 1),
         |dfTop AS (SELECT word, df FROM df
         |  ORDER BY df ASC, word LIMIT ${QTermRanks.max}),
         |qt AS (SELECT word, df, rnk, CAST((rnk - ${QTermRanks.head}) // 2
         |      AS BIGINT) AS query_id
         |  FROM (SELECT word, df, ROW_NUMBER() OVER (
         |      ORDER BY df ASC, word) AS rnk FROM dfTop)
         |  WHERE rnk IN $ranksIn),
         |tf AS (SELECT ti.doc_id, ti.dl, ti.word, qt.query_id, qt.df,
         |    CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM ti JOIN qt USING (word)
         |  GROUP BY 1, 2, 3, 4, 5),
         |ts AS (SELECT query_id, doc_id,
         |    ${ExactNum.rndSql(
          s"""((CAST((length(bin(s.n_docs)) - length(bin(tf.df)))
             | AS DOUBLE) * (tf.tf * (1 + $K1))
             | / (tf.tf + $K1 * ((1 - $B) + $B
             |   * (CAST(tf.dl AS DOUBLE) / s.avgdl)))) * 1e6)"""
            .stripMargin.replace("\n", ""))} AS score_u
         |  FROM tf, stats s),
         |sc AS (SELECT query_id, doc_id,
         |    CAST(SUM(score_u) AS BIGINT) AS score_u
         |  FROM ts GROUP BY 1, 2),
         |ranked AS (SELECT query_id, doc_id, score_u, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS rank
         |  FROM sc)
         |SELECT query_id, rank, doc_id, score_u
         |FROM ranked WHERE rank <= $TopK
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          filter(tokens(col("text")), w => w =!= "").as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("long").as("dl"))
        .localCheckpoint() // one tokenize pass: stats + df + postings
      val ti = t.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("word"))
      val stats = t.agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      val df = ti.groupBy("word")
        .agg(count_distinct(col("doc_id")).as("df"))
      // distributed top-K first (TakeOrderedAndProject); the global
      // row_number window then sorts ranks-many rows, not the vocab
      val qt = df.orderBy(col("df").asc, col("word")).limit(QTermRanks.max)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("df").asc, col("word"))))
        .filter(col("rnk").isin(QTermRanks: _*))
        .select(col("word"), col("df"),
          ((col("rnk") - QTermRanks.head) / 2).cast("long").as("query_id"))
      val tf = ti.join(broadcast(qt), "word")
        .groupBy("doc_id", "dl", "word", "query_id", "df")
        .agg(count(lit(1)).as("tf"))
      val idfBits =
        (length(bin(col("n_docs"))) - length(bin(col("df")))).cast("double")
      val tfPart = (col("tf") * lit(1 + K1)) /
        (col("tf") + lit(K1) * (lit(1 - B) + lit(B) *
          (col("dl").cast("double") / col("avgdl"))))
      val ts = tf.crossJoin(broadcast(stats))
        .select(col("query_id"), col("doc_id"),
          ExactNum.rnd((idfBits * tfPart) * lit(1e6)).cast("long")
            .as("score_u"))
      val sc = ts.groupBy("query_id", "doc_id")
        .agg(sum("score_u").as("score_u"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("score_u").desc, col("doc_id"))
      sc.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select("query_id", "rank", "doc_id", "score_u")
        .orderBy("query_id", "rank")
    }
  }

  val all: Seq[QuerySpec] = Seq(t53Bm25TopK)
}

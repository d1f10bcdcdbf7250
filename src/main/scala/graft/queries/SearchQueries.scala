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
  /** Per-scorer candidate-list depth feeding t80's fusion. */
  private val FuseN = 20
  /** RRF constant (Cormack et al. 2009) and the fixed-point scale:
    * contribution of rank r is RrfScale div (RrfK + r) — integer
    * truncating division, identical on both engines. */
  private val RrfK = 60
  private val RrfScale = 1000000L

  /** DuckDB CTE chain ending in `sc(query_id, doc_id, score_u)` — the
    * BM25-scored candidate set — with `tf` and `stats` still in scope
    * for downstream scorers. Shared by the t53 oracle and t80's
    * fusion oracle so the lexical leg cannot drift between them. */
  private val Bm25CoreCtesSql: String = {
    import TextQueries.ToksSql
    val ranksIn = QTermRanks.mkString("(", ", ", ")")
    s"""t AS (SELECT doc_id,
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
       |  FROM ts GROUP BY 1, 2)""".stripMargin
  }

  /** Spark twin of [[Bm25CoreCtesSql]]: the scored frames every
    * retrieval gate builds on. `sc` is (query_id, doc_id, score_u);
    * `tf`/`stats` feed t80's second scorer. */
  private[graft] final case class Bm25Core(
      tf: DataFrame, stats: DataFrame, sc: DataFrame)

  /** STREAMING-SAFE tokenize projection (doc_id, toks, dl) — pure
    * shared expressions over any docs frame (batch or readStream):
    * the batch core wraps it in a localCheckpoint; the streaming door
    * applies it per micro-batch. */
  private def tokenizeProjection(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        filter(tokens(col("text")), w => w =!= "").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("dl"))

  /** (doc_id, dl) — the doc-length half of the retrieval door. Kept
    * separate from the postings half because a zero-token document
    * counts in n_docs/avgdl but emits no posting row. */
  private[graft] def docLengthsOf(docs: DataFrame): DataFrame =
    tokenizeProjection(docs).select("doc_id", "dl")

  /** (doc_id, dl, word, tf) token-count rows — the postings half of
    * the retrieval door. A document arrives whole (one row), so its
    * counts here are its FINAL tf: appended per micro-batch to a
    * standing postings table, the deltas need no cross-batch merge. */
  private[graft] def tokenCountsOf(docs: DataFrame): DataFrame =
    tokenizeProjection(docs)
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("word"))
      .groupBy("doc_id", "dl", "word")
      .agg(count(lit(1)).as("tf"))

  /** df-ranked query terms (word, df, query_id) off a
    * document-frequency frame — distributed top-K first
    * (TakeOrderedAndProject); the global row_number window then sorts
    * ranks-many rows, not the vocab. */
  private def queryTerms(dfreq: DataFrame): DataFrame =
    dfreq.orderBy(col("df").asc, col("word")).limit(QTermRanks.max)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("df").asc, col("word"))))
      .filter(col("rnk").isin(QTermRanks: _*))
      .select(col("word"), col("df"),
        ((col("rnk") - QTermRanks.head) / 2).cast("long").as("query_id"))

  /** The scoring tail (tf, stats) → sc — ONE expression tree shared by
    * the batch core and the standing-postings finalize, so the two
    * compositions cannot drift on a single float op. */
  private def scoredCore(tf: DataFrame, stats: DataFrame): Bm25Core = {
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
    Bm25Core(tf, stats, sc)
  }

  private def bm25Core(s: SparkSession, d: String): Bm25Core = {
    val t = tokenizeProjection(Tables.documents(s, d))
      .localCheckpoint() // one tokenize pass: stats + df + postings
    val ti = t.select(col("doc_id"), col("dl"),
      explode(col("toks")).as("word"))
    val stats = t.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    // df off the per-doc DISTINCT token arrays (r21): the dedup is
    // row-local (array_distinct over the checkpointed toks), so the
    // aggregate is a plain map-side-combinable count over ~|vocab|·docs
    // rows instead of a two-phase COUNT(DISTINCT doc_id) over every
    // token instance — same integers (a word counts once per doc
    // containing it either way).
    val df = t.select(explode(array_distinct(col("toks"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df"))
    val qt = queryTerms(df)
    val tf = ti.join(broadcast(qt), "word")
      .groupBy("doc_id", "dl", "word", "query_id", "df")
      .agg(count(lit(1)).as("tf"))
    scoredCore(tf, stats)
  }

  /** The STANDING-POSTINGS composition of the same core: scoring off
    * accumulated (doc_id, dl) and (doc_id, dl, word, tf) tables —
    * what a publish pass runs over the streaming door's output
    * instead of re-scanning the corpus. df comes off the postings
    * rows (exactly the batch value: tc is (doc_id, word)-unique);
    * stats off the length table (zero-token docs included); the
    * scoring tail is [[scoredCore]], byte-shared with the batch
    * path. */
  private[graft] def bm25CoreOfParts(dlen: DataFrame,
      tc: DataFrame): Bm25Core = {
    val stats = dlen.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val df = tc.groupBy("word")
      .agg(count_distinct(col("doc_id")).as("df"))
    val qt = queryTerms(df)
    val tf = tc.join(broadcast(qt), "word")
      .select("doc_id", "dl", "word", "query_id", "df", "tf")
    scoredCore(tf, stats)
  }

  /** t53's ranked-retrieval tail over a scored core — shared by the
    * batch gate and the streaming finalize (StreamingRetrievalSpec)
    * so the published top-k cannot drift between the two tiers. */
  private[graft] def t53TailOf(core: Bm25Core): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_u").desc, col("doc_id"))
    core.sc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "doc_id", "score_u")
      .orderBy("query_id", "rank")
  }

  val t53Bm25TopK: QuerySpec =
    QuerySpec.sql(
      "t53_bm25_topk",
      s"""WITH $Bm25CoreCtesSql,
         |ranked AS (SELECT query_id, doc_id, score_u, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS rank
         |  FROM sc)
         |SELECT query_id, rank, doc_id, score_u
         |FROM ranked WHERE rank <= $TopK
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      t53TailOf(bm25Core(s, d))
    }

  /** T80 — RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher 2009)
    * of two retrieval scorers over the same query set: the BM25 leg
    * ([[Bm25CoreCtesSql]], shared byte-for-byte with t53) and a
    * linear weighted-TF dot-product leg (Σ tf·idf_bits² — the
    * unnormalized inner product a sparse "dense-ish" retriever
    * computes; linear tf and no length normalization make it rank
    * genuinely differently from BM25's saturated tf). Each leg emits
    * its top-[[FuseN]] list; fusion scores a doc
    * Σ_legs RrfScale div (RrfK + rank) — integer truncating division
    * on both engines, absent-in-list contributes 0 — and the fused
    * top-[[TopK]] ships with both legs' ranks (0 = not retrieved by
    * that leg) for auditability.
    *
    * Scale shape: both legs reuse ONE postings build (the `tf` frame
    * — query terms broadcast-semi-joined before aggregation), each
    * leg's rank window partitions by query_id over candidate docs
    * only, and the fusion join is per-(query, doc) over ≤ 2·FuseN
    * rows per query. At lake scale the legs would be served from the
    * standing inverted/ANN indexes; the fusion operator itself never
    * touches the corpus. */
  val t80RrfFusion: QuerySpec =
    QuerySpec.sql(
      "t80_rrf_fusion",
      s"""WITH $Bm25CoreCtesSql,
         |ds AS (SELECT tf.query_id, tf.doc_id,
         |    CAST(SUM(tf.tf
         |      * (length(bin(s.n_docs)) - length(bin(tf.df)))
         |      * (length(bin(s.n_docs)) - length(bin(tf.df))))
         |      AS BIGINT) AS score2_u
         |  FROM tf, stats s GROUP BY 1, 2),
         |r1 AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS rnk
         |  FROM sc),
         |r2 AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score2_u DESC, doc_id) AS rnk
         |  FROM ds),
         |c1 AS (SELECT * FROM r1 WHERE rnk <= $FuseN),
         |c2 AS (SELECT * FROM r2 WHERE rnk <= $FuseN),
         |fused AS (SELECT
         |    COALESCE(c1.query_id, c2.query_id) AS query_id,
         |    COALESCE(c1.doc_id, c2.doc_id) AS doc_id,
         |    CAST(COALESCE($RrfScale // ($RrfK + c1.rnk), 0)
         |       + COALESCE($RrfScale // ($RrfK + c2.rnk), 0)
         |      AS BIGINT) AS rrf_u,
         |    CAST(COALESCE(c1.rnk, 0) AS BIGINT) AS lex_rank,
         |    CAST(COALESCE(c2.rnk, 0) AS BIGINT) AS tf_rank
         |  FROM c1 FULL OUTER JOIN c2
         |    ON c1.query_id = c2.query_id AND c1.doc_id = c2.doc_id),
         |ranked AS (SELECT query_id, doc_id, rrf_u, lex_rank, tf_rank,
         |    ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY rrf_u DESC, doc_id) AS rank
         |  FROM fused)
         |SELECT query_id, rank, doc_id, rrf_u, lex_rank, tf_rank
         |FROM ranked WHERE rank <= $TopK
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      t80TailOf(bm25Core(s, d))
    }

  /** t80's fusion tail over a scored core (both scorers + RRF merge) —
    * shared by the batch gate and the streaming finalize, like
    * [[t53TailOf]]. */
  private[graft] def t80TailOf(core: Bm25Core): DataFrame = {
    val bits = length(bin(col("n_docs"))) - length(bin(col("df")))
    val ds = core.tf.crossJoin(broadcast(core.stats))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * bits * bits).as("score2_u"))
    def topList(scored: DataFrame, scoreCol: String): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(col(scoreCol).desc, col("doc_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= FuseN)
        .select("query_id", "doc_id", "rnk")
    }
    val c1 = topList(core.sc, "score_u")
    val c2 = topList(ds, "score2_u")
    val fused = c1.withColumnRenamed("rnk", "rnk1")
      .join(c2.withColumnRenamed("rnk", "rnk2"),
        Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(expr(s"$RrfScale div ($RrfK + rnk1)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfK + rnk2)"), lit(0L)))
          .as("rrf_u"),
        coalesce(col("rnk1"), lit(0)).cast("long").as("lex_rank"),
        coalesce(col("rnk2"), lit(0)).cast("long").as("tf_rank"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_u").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "rank", "doc_id", "rrf_u", "lex_rank",
        "tf_rank")
      .orderBy("query_id", "rank")
  }

  val all: Seq[QuerySpec] = Seq(t53Bm25TopK, t80RrfFusion)
}

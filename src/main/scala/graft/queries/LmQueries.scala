package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis._

/** Statistical-LM quality scoring over `documents` — the CCNet-family
  * curation signal the engine was missing: a bigram language model
  * trained ON the corpus scores every document's surprisal, and the
  * Moore–Lewis contrast of an in-domain model against the general one
  * ranks documents by domain fit (Moore & Lewis, "Intelligent
  * Selection of Language Model Training Data", ACL 2010; CCNet uses
  * the same shape with a pretrained KenLM).
  *
  * Float discipline (the house rule): a float `ln` sum is
  * order-dependent AND libm-divergent across engines, so surprisal is
  * quantized to WHOLE BITS with pure integer arithmetic —
  * `floor(log2(x)) = length(bin(x)) - 1` exactly, for any positive
  * BIGINT, in both Spark and DuckDB. Each add-one-smoothed bigram
  * surprisal -log2((c2+1)/(c1+V)) becomes `bitlen(c1+V) -
  * bitlen(c2+1)` (±1 bit of the float value, deterministic), integer
  * sums are associative-exact, and the ONLY float op is one final
  * correctly-rounded division per document. Production would swap
  * whole-bit surprisal for float log against a broadcast pretrained
  * model; every plan shape below is unchanged by that swap.
  *
  * Scale shape: bigram extraction is scan-local (`slice`+`zip_with`
  * over one checkpointed tokenized scan — no explode-to-64× blowup).
  * Model training filters the instance STREAM by the training
  * predicate (`lang` rides the rows, so restricting the training set
  * is a pushed filter, never a doc-id join — a doc-id list is itself
  * corpus-sized at 100 TB) and aggregates with map-side partials; the
  * scoring side reduces to per-doc DISTINCT bigrams first, so the
  * model joins touch distinct (doc, gram) rows, not instances. At
  * 100 TB the model tables are Zipf-concentrated but can exceed
  * broadcast size; the scoring joins hash on `gram`/`w1`, and AQE
  * picks broadcast while the model fits (it does at every tested
  * sf). A real deployment prunes the model to top-M grams + an OOV
  * bucket, which bounds the broadcast permanently — the join key and
  * plan are identical.
  */
object LmQueries {

  /** Per-document bigram instances: (doc_id, lang, gram = "w1 w2",
    * w1). Row-local: two `slice` views zipped — docs with <2 tokens
    * emit an empty array (slice length is clamped at 0: Spark's
    * `sequence` descends on negative ranges, t43's lesson, so no
    * sequence here at all). `lang` rides along so a training-set
    * restriction is a scan FILTER on the instance stream — never a
    * doc-id join (a doc-id list is corpus-sized at 100 TB; a language
    * predicate is free). */
  private def bigrams(docs: DataFrame): DataFrame = {
    val n = size(col("toks"))
    val pairs = zip_with(
      slice(col("toks"), lit(1), greatest(n - 1, lit(0))),
      slice(col("toks"), lit(2), greatest(n - 1, lit(0))),
      (a, b) => struct(concat_ws(" ", a, b).as("gram"), a.as("w1")))
    docs.select(col("doc_id"), col("lang"), explode(pairs).as("b"))
      .select(col("doc_id"), col("lang"), col("b.gram"), col("b.w1"))
  }

  /** Tokenized corpus: (doc_id, lang, toks). */
  private def toked(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))

  /** Whole-bit add-one bigram surprisal of every document under each
    * model in `models` (tag → training predicate): (doc_id, n_bigrams,
    * nll_<tag>...). Scoring covers ALL documents; unseen grams/
    * contexts hit the smoothing floor (c=0) via left joins — the OOV
    * penalty is bitlen(V) bits, the model's maximum, exactly as
    * add-one prescribes.
    *
    * ONE pass scores every model: each model contributes three
    * broadcast-sized joins (c2/c1/V) onto the same distinct-bigram
    * frame and one extra SUM in the same per-doc aggregation — there
    * is no corpus-sized score⋈score join anywhere (the first cut
    * joined two scored frames on doc_id; ×100 planned it as a
    * corpus-wide SMJ). Zero-bigram docs come from a row-local filter
    * on the tokenized scan UNION'd in — not a corpus-wide left join
    * whose only job was the empty tail. */
  private def bigramNll(s: SparkSession, d: String,
      models: Seq[(String, Column)]): DataFrame = {
    val t = toked(s, d).localCheckpoint() // one documents scan: train + score
    val bg = bigrams(t) // narrow over the checkpointed scan, computed per consumer
    val nb = bg
      .groupBy("doc_id", "gram", "w1").agg(count(lit(1)).as("k"))
    var cur = nb
    val nlls = models.map { case (tag, pred) =>
      val trainBg = bg.filter(pred) // scan filter — no doc-id join
      val c2 = trainBg.groupBy("gram").agg(count(lit(1)).as(s"n2_$tag"))
      val c1 = trainBg.groupBy("w1").agg(count(lit(1)).as(s"n1_$tag"))
      val vocab = t.filter(pred).select(explode(col("toks")).as("tok"))
        .agg(count_distinct(col("tok")).as(s"V_$tag"))
      cur = cur
        .join(c2, Seq("gram"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(broadcast(vocab))
      val bits =
        length(bin(coalesce(col(s"n1_$tag"), lit(0L)) + col(s"V_$tag"))) -
          length(bin(coalesce(col(s"n2_$tag"), lit(0L)) + lit(1L)))
      sum(col("k") * bits.cast("long")).as(s"nll_$tag")
    }
    val scored = cur.groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"), nlls: _*)
    val outCols = Seq(col("doc_id"), col("n_bigrams")) ++
      models.map { case (tag, _) => col(s"nll_$tag") }
    val zeros = t.filter(size(col("toks")) < 2)
      .select(Seq(col("doc_id"), lit(0L).as("n_bigrams")) ++
        models.map { case (tag, _) => lit(0L).as(s"nll_$tag") }: _*)
    scored.select(outCols: _*).union(zeros)
  }

  /** SQL twin of [[bigramNll]] as a CTE chain ending in `out`
    * (doc_id, n_bigrams, nll_<tag>...); each model's `where` filters
    * its TRAINING set (scoring is always the whole corpus). */
  private def bigramNllSql(models: Seq[(String, String)]): String = {
    import TextQueries.ToksSql
    val modelCtes = models.map { case (tag, where) =>
      s"""c2_$tag AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n2_$tag
         |  FROM bg WHERE $where GROUP BY 1),
         |c1_$tag AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1_$tag
         |  FROM bg WHERE $where GROUP BY 1),
         |v_$tag AS (SELECT COUNT(DISTINCT tok) AS V_$tag
         |  FROM (SELECT unnest(toks) AS tok FROM t WHERE $where))"""
        .stripMargin
    }.mkString(",\n")
    val modelJoins = models.map { case (tag, _) =>
      s"""  LEFT JOIN c2_$tag USING (gram)
         |  LEFT JOIN c1_$tag USING (w1)
         |  CROSS JOIN v_$tag""".stripMargin
    }.mkString("\n")
    val nllSums = models.map { case (tag, _) =>
      s"""    CAST(SUM(nb.k * (
         |      length(bin(COALESCE(n1_$tag, 0) + V_$tag)) -
         |      length(bin(COALESCE(n2_$tag, 0) + 1)))) AS BIGINT)
         |      AS nll_$tag""".stripMargin
    }.mkString(",\n")
    val zeroNlls = models.map(_ => "0").mkString(", ")
    s"""t AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents),
       |bg AS (
       |  SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS gram,
       |    toks[i] AS w1
       |  FROM (SELECT doc_id, lang, toks, unnest(range(1, len(toks))) AS i
       |        FROM t)
       |),
       |nb AS (SELECT doc_id, gram, w1, COUNT(*) AS k
       |  FROM bg GROUP BY 1, 2, 3),
       |$modelCtes,
       |sc AS (
       |  SELECT nb.doc_id, CAST(SUM(nb.k) AS BIGINT) AS n_bigrams,
       |$nllSums
       |  FROM nb
       |$modelJoins
       |  GROUP BY nb.doc_id),
       |out AS (SELECT * FROM sc
       |  UNION ALL SELECT doc_id, 0, $zeroNlls FROM t
       |  WHERE len(toks) < 2)""".stripMargin
  }

  /** T48 — BIGRAM-LM SURPRISAL SCORE: the corpus-trained quality
    * signal. High mean bits = improbable token transitions (gibberish,
    * OCR noise, wrong-language fragments); low = repetitive/boilerplate
    * text. A curation pipeline thresholds or band-passes this column
    * next to t7's heuristic score. */
  val t48BigramLm: QuerySpec = QuerySpec.sql(
    "t48_bigram_lm",
    s"""WITH ${bigramNllSql(Seq("g" -> "TRUE"))}
       |SELECT doc_id, n_bigrams, nll_g AS nll_bits,
       |  CASE WHEN n_bigrams > 0
       |       THEN CAST(nll_g AS DOUBLE) / n_bigrams END AS mean_bits
       |FROM out
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    bigramNll(s, d, Seq("g" -> lit(true)))
      .select(col("doc_id"), col("n_bigrams"),
        col("nll_g").as("nll_bits"),
        when(col("n_bigrams") > 0,
          col("nll_g").cast("double") / col("n_bigrams")).as("mean_bits"))
      .orderBy("doc_id")
  }

  /** T49 — MOORE–LEWIS DATA SELECTION: score every document under an
    * IN-DOMAIN model (trained on `lang = 'en'` rows — the stand-in for
    * "looks like the target distribution") and an OUT-domain model
    * (the complement, `lang <> 'en'`); the cross-entropy DIFFERENCE
    * ranks domain fit, and `selected` keeps documents the in-domain
    * model finds MORE probable. The paper contrasts in-domain vs
    * general; with count-trained add-one models the complement is the
    * right OUT side — a full-corpus model CONTAINS the in-domain
    * counts, so its corpus-size advantage under smoothing swamps the
    * domain term at small scale (measured: every doc scored
    * "general" against t48's model), while disjoint subsets carry
    * symmetric smoothing bias and the OOV penalty cuts both ways.
    * The sign test is pure-integer (`nll_in < nll_out` — both sums
    * count the same bigram instances, so the denominators cancel);
    * `delta_bits` is the one correctly-rounded division, for
    * ranking. */
  val t49MooreLewis: QuerySpec = QuerySpec.sql(
    "t49_moore_lewis",
    s"""WITH ${bigramNllSql(Seq("in" -> "lang = 'en'",
        "out" -> "lang <> 'en'"))}
       |SELECT doc_id, n_bigrams, nll_in, nll_out,
       |  CASE WHEN n_bigrams > 0
       |       THEN CAST(nll_in - nll_out AS DOUBLE) / n_bigrams
       |  END AS delta_bits,
       |  CASE WHEN n_bigrams > 0 THEN nll_in < nll_out
       |  END AS selected
       |FROM out
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    bigramNll(s, d,
      Seq("in" -> (col("lang") === "en"), "out" -> (col("lang") =!= "en")))
      .select(col("doc_id"), col("n_bigrams"), col("nll_in"), col("nll_out"),
        when(col("n_bigrams") > 0,
          (col("nll_in") - col("nll_out")).cast("double") / col("n_bigrams"))
          .as("delta_bits"),
        when(col("n_bigrams") > 0, col("nll_in") < col("nll_out"))
          .as("selected"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity band for [[t54ManifestLm]] — corpus-tuned
    * constants, as in the original (CCNet picks per-corpus percentile
    * cuts): the gate corpus' mean_bits spans [4.17, 4.9] with median
    * 4.52, so this band drops both tails (boilerplate-repetitive low
    * end, noisy high end) while keeping ~¾ of documents. */
  private[queries] val LmBandLo = 4.3
  private[queries] val LmBandHi = 4.7

  /** T54 — the TRAINING-SET MANIFEST WITH THE LM GATE: t28b's
    * star-cluster manifest (quality verdict ⋈ near-dup keeper ⋈
    * deterministic split) extended with t48's bigram-LM band-pass —
    * the full CCNet-shaped include decision (heuristics + dedup + LM
    * perplexity) in one row per document.
    *
    * Scale shape: one more doc-keyed equi join riding the same
    * doc_id key the manifest already joins on — co-partitioned with
    * the existing composition, no new join key; the LM side is t48's
    * one-pass scoring (broadcast model tables). */
  val t54ManifestLm: QuerySpec = QuerySpec.sql(
    "t54_manifest_lm",
    s"""SELECT m.doc_id, m.split, m.selected, l.mean_bits,
       |  (l.n_bigrams > 0 AND l.mean_bits >= $LmBandLo
       |    AND l.mean_bits <= $LmBandHi) AS lm_keep,
       |  (m.selected AND l.n_bigrams > 0 AND l.mean_bits >= $LmBandLo
       |    AND l.mean_bits <= $LmBandHi) AS final_keep
       |FROM (${TextQueries.t28bManifestStar.oracle.get}) m
       |JOIN (${t48BigramLm.oracle.get}) l ON m.doc_id = l.doc_id
       |ORDER BY m.doc_id""".stripMargin) { (s, d) =>
    val lmKeep = col("n_bigrams") > 0 &&
      col("mean_bits") >= LmBandLo && col("mean_bits") <= LmBandHi
    TextQueries.t28bManifestStar.run(s, d)
      .select(col("doc_id"), col("split"), col("selected"))
      .join(t48BigramLm.run(s, d)
        .select(col("doc_id"), col("n_bigrams"), col("mean_bits")), "doc_id")
      .select(col("doc_id"), col("split"), col("selected"), col("mean_bits"),
        lmKeep.as("lm_keep"),
        (col("selected") && lmKeep).as("final_keep"))
      .orderBy("doc_id")
  }

  val all: Seq[QuerySpec] = Seq(t48BigramLm, t49MooreLewis, t54ManifestLm)
}

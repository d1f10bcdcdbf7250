package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis._

/** BPE tokenizer induction over `documents` (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * missing front door of a training-data pipeline: before a corpus is
  * packed (t41) or token-counted (t8) someone has to TRAIN the
  * tokenizer, on the corpus, at corpus scale.
  *
  * Architecture (the production split): Spark owns the corpus-scale
  * part — one token-explode + word groupBy reduces 100 TB of text to
  * a word-frequency table, capped at the top-[[BpeW]] words (exact
  * distributed top-K: `TakeOrderedAndProject`, no global sort) — and
  * the merge loop then iterates on that VOCAB-sized frame only:
  * per round one pair-count aggregation (map-side partial) and one
  * argmax row. Corpus size never appears in the loop.
  *
  * Exact cross-engine parity without a tokenizer library: a word's
  * segmentation state is its symbols joined by TWO spaces (padded
  * with one), so applying merge (w1,w2)→w1w2 is a plain substring
  * `replace(' w1  w2 ', ' w1w2 ')`: each match consumes ONE space of
  * each neighboring gap and the replacement restores it, so chained
  * occurrences stay matchable and overlaps resolve left-to-right
  * non-overlapping — byte-identical greedy semantics in Spark's
  * UTF8String.replace and DuckDB's replace, no regex (tokens are
  * [a-z0-9]+, so symbols never contain spaces). Pair counts are
  * integer sums; ties break (count DESC, w1, w2) — total order, both
  * engines. */
object BpeQueries {

  import TextQueries.ToksSql

  /** Merge rounds. Real vocabs run tens of thousands; the loop shape
    * is round-linear and each round is one vocab-sized aggregation, so
    * the unrolled-oracle depth is the only reason to keep this small
    * here. */
  private[queries] val BpeM = 6

  /** Word-frequency table cap (the standard corpus-side bound: the
    * Zipf tail adds mass to no pair worth merging; the cap bounds the
    * loop's frame at any corpus size). */
  private[queries] val BpeW = 10000

  /** Initial segmentation: characters double-space-joined. */
  private def charSym(w: Column): Column =
    trim(regexp_replace(w, "(.)", "$1  "))

  /** One padded-replace merge application. */
  private def applyMerge(sym: Column, w1: Column, w2: Column,
      merged: Column): Column =
    trim(replace(concat(lit(" "), sym, lit(" ")),
      concat(lit(" "), w1, lit("  "), w2, lit(" ")),
      concat(lit(" "), merged, lit(" "))))

  /** Subword-unit count of `word` under a TRAINED merge list — the
    * t51/t63 segmentation fold, factored to ONE definition: the
    * collected M-row model rides into the plan as literals (the
    * build/serve split — training is the batch tier's job), so batch
    * consumers and the streaming fertility leg
    * ([[graft.streaming.TokenizerStream]]) compute identical units
    * and cannot drift. */
  private[graft] def unitsOf(word: Column,
      merges: Array[org.apache.spark.sql.Row]): Column = {
    val segSym = merges.foldLeft(charSym(word)) { (acc, m) =>
      applyMerge(acc, lit(m.getAs[String]("w1")), lit(m.getAs[String]("w2")),
        lit(m.getAs[String]("merged")))
    }
    size(split(segSym, "  ")).cast("long")
  }

  /** Top-[[BpeW]] word frequencies — the corpus-scale reduction. */
  private def wordCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .orderBy(col("wc").desc, col("word")).limit(BpeW)

  private val mergesMemo = new Clustering.Memo[(SparkSession, String)]

  /** The trained merge table (round, w1, w2, merged, cnt) — the model
    * artifact. Each round localCheckpoints the 1-row argmax and the
    * rewritten vocab so round r+1's plan starts from materialized
    * state (the CC-loop convention); memoized per corpus fingerprint
    * so the apply side (t51) never retrains. */
  private[graft] def trainMerges(s: SparkSession, d: String): DataFrame = {
    val key = (s, d)
    val stamp = Clustering.fingerprint(d, "documents")
    mergesMemo.reuse(key, stamp) {
      var syms = wordCounts(s, d)
        .select(col("word"), col("wc"), charSym(col("word")).as("sym"))
        .localCheckpoint()
      val bests = (1 to BpeM).map { r =>
        val arr = split(col("sym"), "  ")
        val n = size(arr)
        val prs = zip_with(
          slice(arr, lit(1), greatest(n - 1, lit(0))),
          slice(arr, lit(2), greatest(n - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))
        val best = syms.select(col("wc"), explode(prs).as("p"))
          .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .agg(sum("wc").as("cnt"))
          .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1)
          .select(lit(r).as("round"), col("w1"), col("w2"),
            concat(col("w1"), col("w2")).as("merged"), col("cnt"))
          .localCheckpoint()
        syms = syms
          .crossJoin(broadcast(best.select(
            col("w1").as("__w1"), col("w2").as("__w2"),
            col("merged").as("__m"))))
          .select(col("word"), col("wc"),
            applyMerge(col("sym"), col("__w1"), col("__w2"), col("__m"))
              .as("sym"))
          .localCheckpoint()
        best
      }
      mergesMemo.record(key, stamp,
        bests.reduce(_ union _).localCheckpoint())
    }
  }

  /** Oracle CTE chain: w0 (capped word counts), s0 (char split), per
    * round pr/b/s CTEs, and `merges` — mirrors [[trainMerges]] round
    * for round. */
  private def bpeCtesSql: String = {
    val rounds = (1 to BpeM).map { r =>
      val p = s"s${r - 1}"
      s"""pr$r AS (SELECT arr[i] AS w1, arr[i+1] AS w2,
         |    CAST(SUM(wc) AS BIGINT) AS cnt
         |  FROM (SELECT wc, arr, unnest(range(1, len(arr))) AS i
         |        FROM (SELECT wc, string_split(sym, '  ') AS arr FROM $p))
         |  GROUP BY 1, 2),
         |b$r AS (SELECT $r AS round, w1, w2, w1 || w2 AS merged, cnt
         |  FROM pr$r ORDER BY cnt DESC, w1, w2 LIMIT 1),
         |s$r AS (SELECT word, wc,
         |    trim(replace(' ' || sym || ' ',
         |      ' ' || b.w1 || '  ' || b.w2 || ' ',
         |      ' ' || b.merged || ' ')) AS sym
         |  FROM $p, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
       |  FROM (SELECT unnest($ToksSql) AS word FROM documents)
       |  WHERE word <> '' GROUP BY 1
       |  ORDER BY wc DESC, word LIMIT $BpeW),
       |s0 AS (SELECT word, wc,
       |  trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS sym FROM w0),
       |$rounds,
       |merges AS (${(1 to BpeM).map(r => s"SELECT * FROM b$r")
        .mkString(" UNION ALL ")})""".stripMargin
  }

  /** T50 — BPE MERGE TRAINING: the ordered merge table. */
  val t50BpeTrain: QuerySpec = QuerySpec.sql(
    "t50_bpe_train",
    s"""WITH $bpeCtesSql
       |SELECT round, w1, w2, merged, cnt FROM merges
       |ORDER BY round""".stripMargin) { (s, d) =>
    trainMerges(s, d).orderBy("round")
  }

  /** T51 — BPE SEGMENTATION STATS: apply the trained merges to every
    * document and report subword counts — the tokenizer-fit metric
    * (units/token → 1 as merges cover the corpus' frequent words).
    *
    * Scale shape: merges are collected (M rows — a model artifact,
    * the bounded-collect the codebook/centroid families already use)
    * and applied as a literal replace chain to the DISTINCT word
    * table, vocab-sized, once per word — never per instance; the
    * instance stream then joins the segmented vocab by word (AQE
    * broadcasts while the vocab fits; the join hashes on `word`
    * either way). */
  val t51BpeSegment: QuerySpec = QuerySpec.sql(
    "t51_bpe_segment",
    s"""WITH $bpeCtesSql,
       |ti AS (SELECT doc_id, word FROM (SELECT doc_id,
       |    unnest($ToksSql) AS word FROM documents) WHERE word <> ''),
       |vw AS (SELECT DISTINCT word FROM ti),
       |g0 AS (SELECT word,
       |  trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS sym FROM vw),
       |${(1 to BpeM).map(r =>
        s"""g$r AS (SELECT word, trim(replace(' ' || sym || ' ',
           |  ' ' || b.w1 || '  ' || b.w2 || ' ',
           |  ' ' || b.merged || ' ')) AS sym FROM g${r - 1}, b$r b)"""
          .stripMargin).mkString(",\n")},
       |wl AS (SELECT word,
       |  CAST(len(string_split(sym, '  ')) AS BIGINT) AS units FROM g$BpeM),
       |sc AS (SELECT ti.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(wl.units) AS BIGINT) AS n_units
       |  FROM ti JOIN wl USING (word) GROUP BY 1),
       |al AS (SELECT * FROM sc
       |  UNION ALL
       |  SELECT doc_id, 0, 0 FROM documents
       |  WHERE len(list_filter($ToksSql, x -> x <> '')) = 0)
       |SELECT doc_id, n_tokens, n_units,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST(n_units AS DOUBLE) / n_tokens
       |  END AS units_per_token
       |FROM al
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val merges = trainMerges(s, d).orderBy("round").collect() // M rows
    // tokenize ONCE (the regex pass is the scan's real cost at scale)
    // and checkpoint; the instance stream and the empty-doc tail both
    // read the materialized arrays
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(tokens(col("text")), w => w =!= "").as("toks"))
      .localCheckpoint()
    val ti = t.select(col("doc_id"), explode(col("toks")).as("word"))
    val wl = ti.select("word").distinct()
      .select(col("word"), unitsOf(col("word"), merges).as("units"))
    val sc = ti.join(wl, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("units").as("n_units"))
    // empty-token docs via a row-local filter union — never a
    // corpus-wide left join whose only job is the empty tail
    val zeros = t.filter(size(col("toks")) === 0)
      .select(col("doc_id"), lit(0L).as("n_tokens"), lit(0L).as("n_units"))
    sc.union(zeros)
      .select(col("doc_id"), col("n_tokens"), col("n_units"),
        when(col("n_tokens") > 0,
          col("n_units").cast("double") / col("n_tokens"))
          .as("units_per_token"))
      .orderBy("doc_id")
  }

  /** T63 — PER-SOURCE TOKENIZER FERTILITY: t51's segmentation rolled
    * up by source — tokens, subword units, fully-merged (single-unit)
    * tokens, and fertility (units per token) per source. This is the
    * mixing-decision view of tokenizer fit: a source whose fertility
    * stays high after training is one the tokenizer serves poorly
    * (its words fragment), which inflates its effective token cost in
    * the mix (t40's rebalance consumes exactly this kind of
    * per-source stat).
    *
    * Scale shape: identical to t51 up to the word join (merges are an
    * M-row model, segmentation runs once per DISTINCT word, the
    * instance stream joins vocab by word) — then the per-doc groupBy
    * is REPLACED by a per-source one: `source` rides the explode, so
    * no doc→source join exists, and the aggregate has one row per
    * source. At 100 TB this is a scan + one vocab-sized broadcast
    * join + a 20-group partial agg. */
  val t63SourceFertility: QuerySpec = QuerySpec.sql(
    "t63_source_fertility",
    s"""WITH $bpeCtesSql,
       |ti AS (SELECT source, word FROM (SELECT source,
       |    unnest($ToksSql) AS word FROM documents) WHERE word <> ''),
       |vw AS (SELECT DISTINCT word FROM ti),
       |g0 AS (SELECT word,
       |  trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS sym FROM vw),
       |${(1 to BpeM).map(r =>
        s"""g$r AS (SELECT word, trim(replace(' ' || sym || ' ',
           |  ' ' || b.w1 || '  ' || b.w2 || ' ',
           |  ' ' || b.merged || ' ')) AS sym FROM g${r - 1}, b$r b)"""
          .stripMargin).mkString(",\n")},
       |wl AS (SELECT word,
       |  CAST(len(string_split(sym, '  ')) AS BIGINT) AS units FROM g$BpeM)
       |SELECT ti.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(wl.units) AS BIGINT) AS n_units,
       |  CAST(SUM(CASE WHEN wl.units = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_whole,
       |  CAST(SUM(wl.units) AS DOUBLE) / COUNT(*) AS fertility
       |FROM ti JOIN wl USING (word)
       |GROUP BY 1
       |ORDER BY source""".stripMargin) { (s, d) =>
    val merges = trainMerges(s, d).orderBy("round").collect() // M rows
    // tokenize ONCE (the t51 discipline): ti feeds both the distinct
    // vocab and the instance join — without the checkpoint the regex
    // pass, the scan's real cost at scale, would run twice
    val ti = Tables.documents(s, d)
      .select(col("source"), explode(filter(tokens(col("text")),
        w => w =!= "")).as("word"))
      .localCheckpoint()
    val wl = ti.select("word").distinct()
      .select(col("word"), unitsOf(col("word"), merges).as("units"))
    ti.join(wl, "word")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum("units").as("n_units"),
        sum(when(col("units") === 1, 1L).otherwise(0L)).as("n_whole"))
      .select(col("source"), col("n_tokens"), col("n_units"),
        col("n_whole"),
        (col("n_units").cast("double") / col("n_tokens")).as("fertility"))
      .orderBy("source")
  }

  val all: Seq[QuerySpec] = Seq(t50BpeTrain, t51BpeSegment,
    t63SourceFertility)
}

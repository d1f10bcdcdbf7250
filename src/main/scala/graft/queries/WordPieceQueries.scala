package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis._

/** WordPiece-style tokenizer induction + greedy longest-match
  * segmentation over `documents` (Schuster & Nakajima 2012; the
  * BERT tokenizer's runtime algorithm) — the second tokenizer family
  * next to BPE (BpeQueries): BPE builds its vocab bottom-up by merge
  * rounds and segments by replaying merges; WordPiece scores
  * candidate substrings by corpus mass and segments by MAXIMAL MUNCH
  * (always take the longest vocab piece at the cursor, else fall
  * back to one character). Greedy matching is exactly expressible on
  * both engines — a row-local positional fold in Spark, a recursive
  * CTE in DuckDB — so unlike a Viterbi unigram-LM the gate is
  * hash-exact with zero float or libm surface.
  *
  * Scale shape: vocab induction reduces the corpus to the capped
  * word-frequency table first (the BpeW discipline — the Zipf tail
  * adds mass to no piece worth keeping), then explodes each vocab
  * word's O(len·4) substrings — vocab-sized, never corpus-sized; the
  * top-K cut is a distributed TakeOrderedAndProject. Segmentation
  * collects the K-piece model (a literal-sized artifact, the
  * centroid/merge-table convention), segments each DISTINCT word
  * once, and joins the instance stream by word — t51's exact plan
  * shape with the replay chain swapped for the greedy fold. */
object WordPieceQueries {

  import TextQueries.ToksSql

  /** Multi-char vocab size (pieces of length 2..[[MaxPieceLen]]). */
  private[queries] val VocabK = 48

  /** Longest candidate piece. */
  private[queries] val MaxPieceLen = 4

  /** Word-frequency cap (shared discipline with BpeQueries.BpeW). */
  private[queries] val WpW = 10000

  /** Capped word-frequency table — the corpus-scale reduction. */
  private def wordCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .orderBy(col("wc").desc, col("word")).limit(WpW)

  /** All (piece, wc) occurrences of lengths 1..[[MaxPieceLen]] in a
    * word — every start position, overlaps counted (one explode: the
    * per-position × per-length grid is flattened row-locally). */
  private def pieceOccurrences(word: Column): Column = {
    val n = length(word)
    filter(
      flatten(transform(sequence(lit(1), n), s =>
        transform(sequence(lit(1), lit(MaxPieceLen)), l =>
          when(s + l - 1 <= n, word.substr(s, l))))),
      p => p.isNotNull)
  }

  /** Oracle CTE chain: w0 (capped word counts), occ (substring
    * occurrence explode), chars (all single-char pieces), subs (the
    * top-K multi-char pieces), vocab (their union). Mirrors the
    * Spark builders definition for definition. */
  private def wpCtesSql: String =
    s"""w0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
       |  FROM (SELECT unnest($ToksSql) AS word FROM documents)
       |  WHERE word <> '' GROUP BY 1
       |  ORDER BY wc DESC, word LIMIT $WpW),
       |occ AS (SELECT substr(word, s, l) AS piece,
       |    CAST(length(substr(word, s, l)) AS BIGINT) AS plen, wc
       |  FROM w0,
       |    unnest(range(1, length(word) + 1)) AS a(s),
       |    unnest(range(1, $MaxPieceLen + 1)) AS b(l)
       |  WHERE s + l - 1 <= length(word)),
       |pm AS (SELECT piece, plen, CAST(SUM(wc) AS BIGINT) AS mass
       |  FROM occ GROUP BY 1, 2),
       |chars AS (SELECT piece, plen, mass,
       |    CAST(ROW_NUMBER() OVER (ORDER BY mass DESC, piece) AS BIGINT)
       |      AS rnk, 'char' AS kind
       |  FROM pm WHERE plen = 1),
       |subs AS (SELECT piece, plen, mass,
       |    CAST(ROW_NUMBER() OVER (ORDER BY mass DESC, piece) AS BIGINT)
       |      AS rnk, 'sub' AS kind
       |  FROM pm WHERE plen > 1
       |  ORDER BY mass DESC, piece LIMIT $VocabK),
       |vocab AS (SELECT * FROM chars UNION ALL SELECT * FROM subs)"""
      .stripMargin

  /** Spark twin of the `pm` CTE: (piece, plen, mass) over the capped
    * word table. */
  private def pieceMass(s: SparkSession, d: String): DataFrame =
    wordCounts(s, d)
      .select(explode(pieceOccurrences(col("word"))).as("piece"),
        col("wc"))
      .groupBy(col("piece"), length(col("piece")).cast("long").as("plen"))
      .agg(sum("wc").as("mass"))

  /** T75 — WORDPIECE VOCAB INDUCTION: every single-char piece plus
    * the top-[[VocabK]] multi-char substrings by corpus mass, ranked
    * within kind by (mass desc, piece). The vocab artifact the greedy
    * segmenter (t76) serves. */
  val t75WordpieceVocab: QuerySpec = QuerySpec.sql(
    "t75_wordpiece_vocab",
    s"""WITH $wpCtesSql
       |SELECT piece, plen, mass, rnk, kind FROM vocab
       |ORDER BY kind, rnk""".stripMargin) { (s, d) =>
    val pm = pieceMass(s, d)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mass").desc, col("piece"))
    val chars = pm.filter(col("plen") === 1)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("kind", lit("char"))
    val subs = pm.filter(col("plen") > 1)
      .orderBy(col("mass").desc, col("piece")).limit(VocabK)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("kind", lit("sub"))
    chars.unionByName(subs)
      .select("piece", "plen", "mass", "rnk", "kind")
      .orderBy("kind", "rnk")
  }
  // NOTE on the rank windows: they run over the PIECE frame — bounded
  // at 36 chars + VocabK subs (post-cap vocab-sized, the model-frame
  // convention), never corpus rows.

  /** The trained multi-char piece set, collected (≤ [[VocabK]] rows —
    * the model artifact; chars are implicit: the greedy fallback). */
  private[graft] def trainedPieces(s: SparkSession, d: String): Set[String] =
    pieceMass(s, d).filter(col("plen") > 1)
      .orderBy(col("mass").desc, col("piece")).limit(VocabK)
      .select("piece").collect().map(_.getString(0)).toSet

  /** Greedy longest-match unit count of `word` under the piece set:
    * a positional fold — at cursor p take the longest piece (length
    * [[MaxPieceLen]]..2) equal to the substring there, else one
    * character; every take is one unit. Row-local; the piece maps are
    * literals. Matching a length-L piece needs L chars remaining,
    * which the map guards for free: a shorter end-of-word substring
    * can never equal an L-char key. */
  private[graft] def greedyUnits(word: Column,
      pieces: Set[String]): Column = {
    val byLen = (2 to MaxPieceLen).map(l =>
      l -> typedLit(pieces.filter(_.length == l).map(_ -> true).toMap))
      .toMap
    val step = (st: Column, i: Column) => {
      val pos = st.getField("pos")
      // foldLeft nests later iterations OUTERMOST, so ascend 2→4 to
      // make the length-4 test the first condition checked (maximal
      // munch; descending here would silently prefer the SHORTEST)
      val take = (2 to MaxPieceLen).foldLeft(lit(1)) { (els, l) =>
        when(element_at(byLen(l), word.substr(pos, lit(l))).isNotNull,
          lit(l)).otherwise(els)
      }
      when(i =!= pos, st).otherwise(
        struct((pos + take).as("pos"), (st.getField("units") + 1L).as("units")))
    }
    aggregate(sequence(lit(1), length(word)),
      struct(lit(1).as("pos"), lit(0L).as("units")), step)
      .getField("units")
  }

  /** T76 — WORDPIECE GREEDY SEGMENTATION STATS: t51's tokenizer-fit
    * view under the WordPiece model — per document the token, char
    * and greedy-unit counts and units-per-token. Greedy is maximal
    * munch: `4,3,2`-piece lookup then the char fallback, so unknown
    * characters cost one unit each and the fold always advances
    * (total on any input). The oracle replays the identical greedy as
    * a recursive CTE (≤ max-word-length steps deep) over the DISTINCT
    * word table.
    *
    * Scale shape: the model is collected once (≤ [[VocabK]] pieces);
    * each DISTINCT word segments once (vocab-sized compute); the
    * instance stream joins segmented words by `word` (AQE broadcasts
    * while the vocab fits) and aggregates per doc with map-side
    * partials — identical plan skeleton to t51, so the two tokenizer
    * families are directly comparable in the scorecard tier. */
  val t76WordpieceSegment: QuerySpec = QuerySpec.sql(
    "t76_wordpiece_segment",
    s"""WITH RECURSIVE $wpCtesSql,
       |ti AS (SELECT doc_id, word FROM (SELECT doc_id,
       |    unnest($ToksSql) AS word FROM documents) WHERE word <> ''),
       |vw AS (SELECT DISTINCT word FROM ti),
       |seg AS (
       |  SELECT word, 1 AS pos, 0 AS units FROM vw
       |  UNION ALL
       |  SELECT word,
       |    pos + (CASE
       |      ${(MaxPieceLen to 2 by -1).map(l =>
        s"""WHEN EXISTS(SELECT 1 FROM subs v
           |        WHERE v.plen = $l AND v.piece = substr(word, pos, $l))
           |      THEN $l""".stripMargin).mkString("\n      ")}
       |      ELSE 1 END),
       |    units + 1
       |  FROM seg WHERE pos <= length(word)),
       |wl AS (SELECT word, CAST(MAX(units) AS BIGINT) AS units
       |  FROM seg WHERE pos = length(word) + 1 GROUP BY 1),
       |sc AS (SELECT ti.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(length(ti.word)) AS BIGINT) AS n_chars,
       |    CAST(SUM(wl.units) AS BIGINT) AS n_units
       |  FROM ti JOIN wl USING (word) GROUP BY 1),
       |al AS (SELECT * FROM sc
       |  UNION ALL
       |  SELECT doc_id, 0, 0, 0 FROM documents
       |  WHERE len(list_filter($ToksSql, x -> x <> '')) = 0)
       |SELECT doc_id, n_tokens, n_chars, n_units,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST(n_units AS DOUBLE) / n_tokens
       |  END AS units_per_token
       |FROM al
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pieces = trainedPieces(s, d)
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(tokens(col("text")), w => w =!= "").as("toks"))
      .localCheckpoint() // one tokenized scan: instances + empty tail
    val ti = t.select(col("doc_id"), explode(col("toks")).as("word"))
    val wl = ti.select("word").distinct()
      .select(col("word"), greedyUnits(col("word"), pieces).as("units"))
    val sc = ti.join(wl, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum("units").as("n_units"))
    val zeros = t.filter(size(col("toks")) === 0)
      .select(col("doc_id"), lit(0L).as("n_tokens"),
        lit(0L).as("n_chars"), lit(0L).as("n_units"))
    sc.union(zeros)
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("n_units"),
        when(col("n_tokens") > 0,
          col("n_units").cast("double") / col("n_tokens"))
          .as("units_per_token"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // t78 — unigram-LM Viterbi segmentation (SentencePiece)
  // ---------------------------------------------------------------

  /** Collected vocab model for Viterbi: piece → (mass-derived
    * whole-bit cost), plus the OOV single-char fallback cost.
    * cost(p) = bitlen(T) − bitlen(mass(p)) ≈ ⌈−log2 p(piece)⌉ with
    * T = Σ mass over the vocab — the t48/t49 whole-bit discipline, so
    * costs are integers and the gate carries zero float surface. */
  private[graft] def viterbiModel(
      s: SparkSession, d: String): (Map[String, Long], Long) = {
    val pm = pieceMass(s, d)
    val vocab =
      pm.filter(col("plen") === 1).select("piece", "mass").collect() ++
        pm.filter(col("plen") > 1)
          .orderBy(col("mass").desc, col("piece")).limit(VocabK)
          .select("piece", "mass").collect()
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val t = vocab.map(_.getLong(1)).sum
    val costs = vocab.map(r =>
      r.getString(0) -> (bitlen(t) - bitlen(r.getLong(1)))).toMap
    (costs, bitlen(t) + 1)
  }

  /** Viterbi (cost, units) of `word` under the piece-cost model: the
    * classic lattice DP as a row-local positional fold. The state is
    * the dp window dp[i−3..i] (lookback bounded by [[MaxPieceLen]]);
    * each step builds one candidate per piece length ending at i and
    * takes `array_min` over the (cost, units) structs — Spark orders
    * structs lexicographically, which IS the tie rule (min cost, then
    * min units), the same total order the oracle's path argmin sorts
    * by. Unknown characters cost `fb` (OOV, > any vocab char), so the
    * DP is total on any input. Candidates for lengths exceeding the
    * cursor guard to an INF sentinel far above any reachable cost
    * (≤ len·fb ≪ 10^9). */
  private[graft] def viterbiCostUnits(word: Column,
      costs: Map[String, Long], fb: Long): Column = {
    val byLen = (1 to MaxPieceLen).map(l =>
      l -> typedLit(costs.filter(_._1.length == l))).toMap
    val Inf = 1000000000L
    val infS = struct(lit(Inf).as("cost"), lit(Inf).as("units"))
    val init = array(infS, infS, infS,
      struct(lit(0L).as("cost"), lit(0L).as("units")))
    val step = (st: Column, i: Column) => {
      val cands = (1 to MaxPieceLen).map { l =>
        val prev = element_at(st, 5 - l) // dp[i-l]; l=1 → newest slot
        val piece = word.substr(i - l + 1, lit(l))
        val cRaw = element_at(byLen(l), piece)
        val c = if (l == 1) coalesce(cRaw, lit(fb)) else cRaw
        when(lit(l) <= i && c.isNotNull,
          struct((prev.getField("cost") + c).as("cost"),
            (prev.getField("units") + 1L).as("units"))).otherwise(infS)
      }
      array(element_at(st, 2), element_at(st, 3), element_at(st, 4),
        array_min(array(cands: _*)))
    }
    element_at(
      aggregate(sequence(lit(1), length(word)), init, step), 4)
  }

  /** T78 — UNIGRAM-LM VITERBI SEGMENTATION (Kudo 2018; the
    * SentencePiece algorithm): segment each word into the
    * minimum-total-cost piece sequence under the mass-derived
    * whole-bit unigram costs — the probabilistic counterpart to t76's
    * greedy (same vocab, same corpus, directly comparable units).
    * Tokenizer tier now covers all three public families: BPE merge
    * replay (t50/t51), WordPiece maximal munch (t75/t76), unigram-LM
    * Viterbi (here).
    *
    * The oracle cannot run a DP fold, so it enumerates EVERY
    * segmentation path of each distinct word as a recursive CTE over
    * a precomputed per-position extension table and takes the
    * (cost, units) argmin — exhaustive ground truth against which the
    * engine's DP must be exactly optimal; any DP bug (a wrong
    * lookback slot, a tie broken the other way) is a value mismatch,
    * not a tolerance miss. Path counts are compositions of word
    * length into parts ≤ 4 — bounded at vocab scale, astronomically
    * infeasible at corpus scale, which is exactly why the ENGINE side
    * is the DP.
    *
    * Scale shape: identical to t76 — model collected (≤ 84 pieces),
    * DISTINCT words segment once (vocab-sized), instances join by
    * word, per-doc partials. */
  val t78UnigramViterbi: QuerySpec = QuerySpec.sql(
    "t78_unigram_viterbi",
    s"""WITH RECURSIVE $wpCtesSql,
       |tot AS (SELECT CAST(SUM(mass) AS BIGINT) AS tm FROM vocab),
       |vc AS (SELECT piece, plen,
       |    CAST(length(bin(tm)) - length(bin(mass)) AS BIGINT) AS cb
       |  FROM vocab, tot),
       |ti AS (SELECT doc_id, word FROM (SELECT doc_id,
       |    unnest($ToksSql) AS word FROM documents) WHERE word <> ''),
       |vw AS (SELECT DISTINCT word FROM ti),
       |pos0 AS (SELECT word, s FROM vw,
       |  unnest(range(1, length(word) + 1)) AS u(s)),
       |ext AS (
       |  SELECT p0.word, p0.s - 1 AS pos, vc.plen, vc.cb
       |  FROM pos0 p0 JOIN vc
       |    ON p0.s + vc.plen - 1 <= length(p0.word)
       |   AND substr(p0.word, p0.s, vc.plen) = vc.piece
       |  UNION ALL
       |  SELECT p0.word, p0.s - 1, 1,
       |    (SELECT CAST(length(bin(tm)) + 1 AS BIGINT) FROM tot)
       |  FROM pos0 p0 WHERE NOT EXISTS (SELECT 1 FROM vc
       |    WHERE vc.plen = 1 AND vc.piece = substr(p0.word, p0.s, 1))),
       |paths AS (
       |  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS units
       |  FROM vw
       |  UNION ALL
       |  SELECT p.word, p.pos + e.plen, p.cost + e.cb, p.units + 1
       |  FROM paths p JOIN ext e ON e.word = p.word AND e.pos = p.pos),
       |best AS (SELECT word, cost, units,
       |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY cost, units)
       |      AS rn
       |  FROM paths WHERE pos = length(word)),
       |wl AS (SELECT word, cost, CAST(units AS BIGINT) AS units
       |       FROM best WHERE rn = 1),
       |sc AS (SELECT ti.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(wl.units) AS BIGINT) AS vit_units,
       |    CAST(SUM(wl.cost) AS BIGINT) AS vit_bits
       |  FROM ti JOIN wl USING (word) GROUP BY 1),
       |al AS (SELECT * FROM sc
       |  UNION ALL
       |  SELECT doc_id, 0, 0, 0 FROM documents
       |  WHERE len(list_filter($ToksSql, x -> x <> '')) = 0)
       |SELECT doc_id, n_tokens, vit_units, vit_bits,
       |  CASE WHEN n_tokens > 0
       |       THEN CAST(vit_units AS DOUBLE) / n_tokens
       |  END AS units_per_token
       |FROM al
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val (costs, fb) = viterbiModel(s, d)
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        filter(tokens(col("text")), w => w =!= "").as("toks"))
      .localCheckpoint()
    val ti = t.select(col("doc_id"), explode(col("toks")).as("word"))
    val wl = ti.select("word").distinct()
      .select(col("word"),
        viterbiCostUnits(col("word"), costs, fb).as("v"))
      .select(col("word"), col("v.cost").as("cost"),
        col("v.units").as("units"))
    val sc = ti.join(wl, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("units").as("vit_units"),
        sum("cost").as("vit_bits"))
    val zeros = t.filter(size(col("toks")) === 0)
      .select(col("doc_id"), lit(0L).as("n_tokens"),
        lit(0L).as("vit_units"), lit(0L).as("vit_bits"))
    sc.union(zeros)
      .select(col("doc_id"), col("n_tokens"), col("vit_units"),
        col("vit_bits"),
        when(col("n_tokens") > 0,
          col("vit_units").cast("double") / col("n_tokens"))
          .as("units_per_token"))
      .orderBy("doc_id")
  }

  val all: Seq[QuerySpec] =
    Seq(t75WordpieceVocab, t76WordpieceSegment, t78UnigramViterbi)
}

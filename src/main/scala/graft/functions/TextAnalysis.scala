package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * canonical tokenization, word shingles, portable MinHash signatures,
  * SimHash bits, fingerprints, language/quality heuristics.
  *
  * Everything is pure Catalyst expressions (no UDFs) and every hash is
  * *portable* (md5 hex over UTF-8), so the DuckDB oracle can reproduce
  * results bit-for-bit. MinHash uses string-min over per-seed md5
  * (h_i(s) = md5(i ++ "|" ++ s)) — equivalent to k independent hash
  * functions, without any engine-specific hash. */
object TextAnalysis {

  /** Canonical normal form: lowercase, non-alphanumerics collapsed to
    * single spaces, trimmed. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Canonical word tokens of the normal form (never empty strings for
    * non-empty input). */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Word n-gram shingles; documents shorter than n collapse to one
    * whole-text shingle. */
  def shingles(toks: Column, n: Int): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), gram))
      .otherwise(array(array_join(toks, " ")))
  }

  /** MinHash signature element i: min over shingles of md5("i|" ++ s).
    * String-min of a uniform hex hash ≈ numeric min-hash; identical in
    * any engine with md5. */
  def minhashSig(sh: Column, i: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(i.toString), lit("|"), s))))

  /** LSH band key over `rows` consecutive signature columns. */
  def bandKey(sigs: Seq[Column]): Column = md5(concat_ws("|", sigs: _*))

  /** SimHash bit-contribution (±1) for bit b of the md5 hex in column
    * `hexCol` — nibble decode via instr over the hex alphabet, portable
    * to any engine with strpos/instr. */
  def simhashContrib(hexCol: String, b: Int): Column = {
    val nibbleIdx = b / 4 + 1
    val shift = 3 - b % 4
    expr(s"CASE WHEN (shiftright(instr('0123456789abcdef', " +
      s"substring($hexCol, $nibbleIdx, 1)) - 1, $shift) & 1) = 1 " +
      s"THEN 1 ELSE -1 END")
  }

  /** English stopword heuristic set for language ID / quality scoring. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "in", "and", "to", "is", "it", "for",
      "on", "with", "as", "at", "by", "or", "be", "this", "that", "are")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => array_contains(array(EnStopwords.map(lit): _*), t)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * canonical tokenization, word shingles, portable MinHash signatures,
  * SimHash bits, fingerprints, language/quality heuristics.
  *
  * Everything is pure Catalyst expressions (no UDFs) and every hash is
  * *portable* (md5 hex over UTF-8), so the DuckDB oracle can reproduce
  * results bit-for-bit. MinHash hashes each shingle ONCE (md5 → 60-bit
  * int) and derives the K signature functions by linear-congruential
  * mixing — no engine-specific hash anywhere. */
object TextAnalysis {

  /** Canonical normal form: lowercase, non-alphanumerics collapsed to
    * single spaces, trimmed. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Canonical word tokens of the normal form (never empty strings for
    * non-empty input). */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Word n-gram shingles; documents shorter than n collapse to one
    * whole-text shingle.
    *
    * Implementation note (hot-path critical): grams are built by
    * zip_with over n shifted slices, NEVER by indexing `toks` inside a
    * lambda — a lambda body re-evaluates any captured expression per
    * element, so `element_at(toks, i+k)` would recompute the whole
    * regex tokenization O(n·|toks|) times per row once Catalyst
    * collapses the projections (measured 60× slowdown at sf0.1). */
  def shingles(toks: Column, n: Int): Column = {
    val m = size(toks) - (n - 1) // gram count when size >= n
    val slices = (0 until n).map(k => slice(toks, lit(k + 1), m))
    val grams = slices.reduce((acc, s) =>
      zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
    when(size(toks) >= n, grams)
      .otherwise(array(array_join(toks, " ")))
  }

  /** MinHash base hash: ONE md5 per shingle, then a 60-bit hex slice as
    * an integer mod p. The K signature functions derive from this via
    * cheap linear-congruential mixing (minhashSig) — hashing cost is
    * O(|shingles|), not O(K·|shingles|), which is the difference
    * between one md5 and twelve per shingle at lake scale. Portable:
    * DuckDB side is CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT). */
  val MinhashP: Long = 2147483647L // 2^31-1; keeps a*v+b within 2^62

  def minhashBase(sh: Column): Column =
    transform(sh, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashP)

  def minhashA(i: Int): Long = 999983L * (i + 1) % MinhashP
  def minhashB(i: Int): Long = 1299709L * (i + 7) % MinhashP

  /** MinHash signature element i over the base-hash array: min of
    * (A_i·v + B_i) mod p — k independent-enough hash functions from one
    * strong base hash (standard Carter–Wegman construction). */
  def minhashSig(hv: Column, i: Int): Column =
    array_min(transform(hv, v =>
      (v * minhashA(i) + minhashB(i)) % MinhashP))

  /** LSH band key over `rows` consecutive signature columns. */
  def bandKey(sigs: Seq[Column]): Column = md5(concat_ws("|", sigs: _*))

  /** The minhash-LSH operating point shared by the batch near-dup
    * (t2) and its streaming analogue — ONE source so the two paths
    * can never band differently. K signature elements, R rows per
    * band, B = K/R bands; est.-Jaccard threshold is matches ≥ K/2. */
  val MinhashK = 12
  val LshRows = 3
  val LshBands: Int = MinhashK / LshRows

  /** The full (doc text → K-element signature) projection at the
    * shared operating point: 3-word shingles → one md5 base hash per
    * shingle → K Carter–Wegman minima. */
  def minhashSignature(text: Column): Column = {
    val hv = minhashBase(shingles(tokens(text), 3))
    array((0 until MinhashK).map(i => minhashSig(hv, i)): _*)
  }

  /** The B band keys of a signature array (1-based element access). */
  def lshBandKeys(sig: Column): Column =
    array((0 until LshBands).map { b =>
      bandKey((0 until LshRows).map(r =>
        element_at(sig, b * LshRows + r + 1)))
    }: _*)

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

  /** [[simhashContrib]] over an md5 bit-FIELD column `v` (the
    * `md5_prefix(tok, width/4)` value; bit 0 = MSB) — pure long
    * arithmetic (r21): hex digit b/4's bit (3−b%4) IS bit b of md5's
    * bit string, so `(v >> (width−1−b)) & 1` extracts the same bit the
    * hex form decodes with an instr+substring per bit per token. ±1
    * values identical; the Spark SimHash builds (t3/t31/t31b/t42) use
    * this, the DuckDB oracles keep the portable hex text. */
  def simhashContribBits(v: Column, b: Int, width: Int): Column =
    shiftright(v, width - 1 - b).bitwiseAND(1).cast("int") * 2 - 1

  /** English stopword heuristic set for language ID / quality scoring. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "in", "and", "to", "is", "it", "for",
      "on", "with", "as", "at", "by", "or", "be", "this", "that", "are")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => array_contains(array(EnStopwords.map(lit): _*), t)))

  /** Deterministic id→[0,256) hash byte (first md5 byte of the decimal
    * string) — the RNG-free split primitive t15 buckets on and t38/
    * ScaleCheck's index demo reuse for the batch/corpus split; one
    * definition here so the split rule cannot drift between them.
    * [[IdHashByteSql]] is its DuckDB twin. */
  def idHashByte(id: Column): Column =
    call_function("md5_prefix", id.cast("string"), lit(2))

  /** DuckDB twin of [[idHashByte]] over a column reference. */
  def idHashByteSql(ref: String): String =
    s"CAST(concat('0x', substr(md5(CAST($ref AS VARCHAR)), 1, 2)) AS BIGINT)"

  /** The t38 ingest-batch rule: ids whose hash byte < 26 (~10%). */
  val DeltaBatchThreshold = 26

  // --- curation verdict rules (t19's signals and t15's split), ONE
  // definition each so the batch gates and the streaming projection
  // (CurationStream.verdictSplit) cannot drift ---

  /** t15's deterministic ~80/10/10 split from [[idHashByte]]
    * (byte < 205 → train, < 230 → val, else test). */
  def splitOf(id: Column): Column = {
    val b = idHashByte(id)
    when(b < 205, "train").when(b < 230, "val").otherwise("test")
  }

  /** t6's n-gram-heuristic language call: English stopword density
    * ≥ 5 % of tokens. */
  def predictedLang(text: Column): Column = {
    val toks = tokens(text)
    when(stopwordCount(toks).cast("double") / size(toks) >= 0.05, "en")
      .otherwise("und")
  }

  /** t7's quality score: length term × stopword-band term ×
    * punctuation-density term. */
  def qualityOf(text: Column): Column = {
    val toks = tokens(text)
    val stopRatio = stopwordCount(toks).cast("double") / size(toks)
    val punctRatio =
      length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double") /
        length(text)
    least(lit(1.0), size(toks).cast("double") / 100) *
      when(stopRatio >= 0.01 && stopRatio <= 0.3, 1.0).otherwise(0.5) *
      when(punctRatio <= 0.2, 1.0).otherwise(0.5)
  }

  /** t19's keep rule over the three signals. */
  def curationKeep(predicted: Column, quality: Column,
      dupFrac: Column): Column =
    predicted === "en" && quality >= 0.5 && dupFrac < 0.3

  /** t19's drop reason: the FIRST failing rule
    * (lang → quality → repetition); NULL when kept. */
  def curationDropReason(predicted: Column, quality: Column,
      dupFrac: Column): Column =
    when(predicted =!= "en", "lang")
      .when(quality < 0.5, "quality")
      .when(dupFrac >= 0.3, "repetition")

  // --- t73 corpus line dedup: the line unit, ONE definition shared by
  // the batch gate and the streaming door so they cannot chunk
  // differently (the minhashSignature discipline) ---

  /** Tokens per dedup "line" (t73 / StreamingLineDedup). */
  val DedupLineW = 10

  /** Non-overlapping [[DedupLineW]]-token chunk lines of a token
    * array as `array<struct<line_idx: long, line: string>>`, 0-based
    * indices. Guarded for empty token arrays (`sequence` DESCENDS on
    * a negative range — t43's lesson — so an empty doc yields zero
    * lines, matching the oracle's `range(0, 0)`). */
  def chunkLines(toks: Column): Column = {
    val n = ceil(size(toks) / lit(DedupLineW.toDouble)).cast("long")
    val chunks = transform(sequence(lit(0L), n - 1), i => struct(
      i.as("line_idx"),
      array_join(slice(toks, (i * DedupLineW + 1).cast("int"),
        lit(DedupLineW)), " ").as("line")))
    when(size(toks) >= 1, chunks)
      .otherwise(array().cast("array<struct<line_idx:bigint,line:string>>"))
  }

  /** The t73 keeper-ordering key: (doc_id, line_idx) encoded as one
    * integer — valid while a document has < 10^6 lines. */
  def linePosKey(docId: Column, lineIdx: Column): Column =
    docId * 1000000L + lineIdx

  // --- t71 DSIR: feature hashing + whole-bit surprisal, ONE
  // definition shared by the batch gate and the frozen-model serve
  // path (DsirServe) ---

  /** DSIR feature-hash bucket count. */
  val DsirBuckets = 64

  /** Token → feature bucket: first 32 bits of md5 mod
    * [[DsirBuckets]] (portable — the DuckDB twin lives in the t71
    * oracle). */
  def dsirBucket(tok: Column): Column =
    call_function("md5_prefix", tok, lit(8)) % DsirBuckets

  /** Integer bit length — the whole-bit surprisal primitive
    * (`floor(log2 x) + 1` for positive x; t48/t49/t71 discipline). */
  def bitlen(c: Column): Column = length(bin(c)).cast("long")
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.tokens

/** Count–min sketch frequency estimation over the corpus token stream
  * (Cormode & Muthukrishnan) — the fixed-memory answer to "how often
  * does each term occur" when the distinct-term table itself is too
  * big to keep: d hash rows × w buckets of counters bound the state at
  * d·w cells for ANY corpus size, every estimate over-counts only
  * (est ≥ exact, whp within εN), and the sketch is a pure aggregate —
  * mergeable across partitions, streams, and days.
  *
  * Spark shape: one explode of the token stream fans each instance to
  * its d (row, bucket) cells; ONE groupBy((row, bucket)) with map-side
  * partial aggregation reduces the corpus to ≤ d·w rows — the shuffle
  * carries at most d·w rows per partition no matter how many tokens
  * scan in. Estimation joins the probe set to the broadcast-sized
  * sketch. Hashes are the house portable md5 base + Carter–Wegman
  * mixing (TextAnalysis.minhashA/B), so the DuckDB oracle reproduces
  * every cell exactly. */
object SketchQueries {

  private[graft] val CmsD = 4 // hash rows
  private[graft] val CmsW = 1024 // buckets per row
  private[graft] val CmsTopK = 20 // probe set: exact top-K tokens

  private val P = TextAnalysis.MinhashP

  /** Portable scalar token hash (the minhashBase formula, un-arrayed) —
    * the codegen'd MD5-prefix kernel (r21, [[graft.plans.Md5PrefixVal]]):
    * value-identical to conv(substring(md5(tok), 1, 15), 16, 10) % P
    * without the hex render + substring + base-16 string parse. */
  private[graft] def baseHash(tok: Column): Column =
    call_function("md5_prefix", tok, lit(15)) % P

  private[graft] def bucket(base: Column, j: Int): Column =
    (base * TextAnalysis.minhashA(j) + TextAnalysis.minhashB(j)) % P % CmsW

  private[graft] def baseHashSql(tok: String): String =
    s"CAST(concat('0x', substr(md5($tok), 1, 15)) AS BIGINT) % $P"

  private def bucketSql(base: String, j: Int): String =
    s"($base * ${TextAnalysis.minhashA(j)} + ${TextAnalysis.minhashB(j)}) % $P % $CmsW"

  /** T52 — CMS HEAVY HITTERS: build the sketch over every token
    * instance, then probe it with the exact top-[[CmsTopK]] tokens and
    * report estimate vs truth. The `over_n` column is the sketch's
    * collision inflation — ≥ 0 by construction (CMS never
    * undercounts), and the gate row pins that the whole estimation
    * path (hashing, cell aggregation, min-of-rows) is bit-identical
    * across engines. */
  val t52CmsHeavyHitters: QuerySpec = {
    import TextQueries.ToksSql
    QuerySpec.sql(
      "t52_cms_heavy_hitters",
      s"""WITH ti AS (SELECT word, ${baseHashSql("word")} AS h
         |  FROM (SELECT unnest($ToksSql) AS word FROM documents)
         |  WHERE word <> ''),
         |cells AS (
         |  ${(0 until CmsD).map(j =>
          s"SELECT ${bucketSql("h", j)} AS bkt, $j AS row_id FROM ti")
          .mkString("\n  UNION ALL\n  ")}
         |),
         |sketch AS (SELECT row_id, bkt, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM cells GROUP BY 1, 2),
         |top AS (SELECT word, h, CAST(COUNT(*) AS BIGINT) AS exact_n
         |  FROM ti GROUP BY word, h
         |  ORDER BY exact_n DESC, word LIMIT $CmsTopK),
         |probes AS (
         |  ${(0 until CmsD).map(j =>
          s"""SELECT word, exact_n, $j AS row_id,
             |    ${bucketSql("h", j)} AS bkt FROM top""".stripMargin)
          .mkString("\n  UNION ALL\n  ")}
         |),
         |est AS (SELECT p.word, p.exact_n, MIN(s.c) AS est_n
         |  FROM probes p JOIN sketch s USING (row_id, bkt)
         |  GROUP BY 1, 2)
         |SELECT word, exact_n, est_n, est_n - exact_n AS over_n
         |FROM est
         |ORDER BY exact_n DESC, word""".stripMargin) { (s, d) =>
      val ti = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .select(col("word"), baseHash(col("word")).as("h"))
      val cells = ti.select(
        posexplode(array((0 until CmsD).map(j => bucket(col("h"), j)): _*))
          .as(Seq("row_id", "bkt")))
      val sketch = cells.groupBy("row_id", "bkt")
        .agg(count(lit(1)).as("c"))
      val top = ti.groupBy("word", "h").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("word")).limit(CmsTopK)
      val probes = top.select(col("word"), col("exact_n"),
        posexplode(array((0 until CmsD).map(j => bucket(col("h"), j)): _*))
          .as(Seq("row_id", "bkt")))
      broadcast(probes)
        .join(sketch, Seq("row_id", "bkt"))
        .groupBy("word", "exact_n")
        .agg(min("c").as("est_n"))
        .select(col("word"), col("exact_n"), col("est_n"),
          (col("est_n") - col("exact_n")).as("over_n"))
        .orderBy(col("exact_n").desc, col("word"))
    }
  }

  // ---------------------------------------------------------------
  // t55 — mergeable equi-width histogram + quantile estimation. The
  // fourth sketch family (HLL cardinality, bloom membership, CMS
  // frequency, histogram DISTRIBUTION): B fixed bins bound the state
  // for any corpus size, shard histograms merge by cellwise addition
  // (same theorem the CMS spec pins), and any quantile is answered
  // from the B-row summary to within one bin width — the distributed
  // answer to "what's the p99 document length" that never sorts the
  // corpus. Spark ships approx_percentile (KLL-ish); this is the
  // transparent fixed-grid variant whose every cell is exact and
  // oracle-checkable, the shape production stats dashboards
  // (length/tokens/score distributions per source) actually use.

  private[graft] val HistW = 100 // bin width (chars)
  private[graft] val HistB = 64 // bins; last bin catches the tail
  private[graft] val HistQs = Seq(25, 50, 75, 90, 99) // percents

  /** T55 — HISTOGRAM QUANTILES: equi-width histogram over
    * `documents.n_chars` (one bounded-state groupBy), quantile targets
    * at ceil(q·N/100) answered from the cumulative histogram, plus a
    * gate-scale exact-truth probe per quantile (rank statistic via the
    * distinct-value cumsum — the probe is the expensive side and
    * exists to pin `in_bin`, the theorem that the exact value always
    * lands inside the estimated bin; production reads the histogram
    * alone). All-integer arithmetic: ranks are `(q·N + 99) div 100`,
    * bins are `x div W` capped, so both engines agree bit-for-bit. */
  val t55HistQuantiles: QuerySpec = QuerySpec.sql(
    "t55_hist_quantiles",
    s"""WITH v AS (SELECT n_chars AS x FROM documents),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
       |h AS (SELECT LEAST(x // $HistW, ${HistB - 1}) AS bin,
       |        CAST(COUNT(*) AS BIGINT) AS c
       |      FROM v GROUP BY 1),
       |ch AS (SELECT bin, c,
       |        CAST(SUM(c) OVER (ORDER BY bin) AS BIGINT) AS cum
       |      FROM h),
       |t AS (SELECT q, (q * n + 99) // 100 AS target_rank
       |      FROM (SELECT unnest([${HistQs.mkString(", ")}]) AS q)
       |      CROSS JOIN n),
       |eb AS (SELECT t.q, t.target_rank, MIN(ch.bin) AS est_bin
       |       FROM t JOIN ch ON ch.cum >= t.target_rank GROUP BY 1, 2),
       |dv AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1),
       |cv AS (SELECT x, CAST(SUM(c) OVER (ORDER BY x) AS BIGINT) AS cum
       |       FROM dv),
       |ex AS (SELECT t.q, MIN(cv.x) AS exact_v
       |       FROM t JOIN cv ON cv.cum >= t.target_rank GROUP BY 1)
       |SELECT eb.q, eb.target_rank, eb.est_bin,
       |  eb.est_bin * $HistW AS est_lo, ch.c AS bin_n, ch.cum AS cum_n,
       |  ex.exact_v,
       |  (ex.exact_v >= eb.est_bin * $HistW AND (eb.est_bin = ${HistB - 1}
       |    OR ex.exact_v < (eb.est_bin + 1) * $HistW)) AS in_bin
       |FROM eb JOIN ch ON eb.est_bin = ch.bin JOIN ex ON eb.q = ex.q
       |ORDER BY eb.q""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val v = Tables.documents(s, d).select(col("n_chars").as("x"))
    val n = v.agg(count(lit(1)).as("n"))
    val h = v.groupBy(least(expr(s"x div $HistW"), lit(HistB - 1L)).as("bin"))
      .agg(count(lit(1)).as("c"))
    // windows below order B-row / distinct-value frames, never the corpus
    val ch = h.withColumn("cum",
      sum("c").over(Window.orderBy("bin"))).localCheckpoint()
    import s.implicits._
    val t = HistQs.toDF("q").crossJoin(broadcast(n))
      .select(col("q"), expr("(q * n + 99) div 100").as("target_rank"))
    val eb = broadcast(t).join(ch, ch("cum") >= col("target_rank"))
      .groupBy("q", "target_rank").agg(min("bin").as("est_bin"))
    val cv = v.groupBy("x").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("x")))
    val ex = broadcast(t).join(cv, cv("cum") >= col("target_rank"))
      .groupBy("q").agg(min("x").as("exact_v"))
    eb.join(ch.select(col("bin"), col("c"), col("cum")),
        col("est_bin") === col("bin"))
      .join(ex, "q")
      .select(col("q"), col("target_rank"), col("est_bin"),
        (col("est_bin") * HistW).as("est_lo"),
        col("c").as("bin_n"), col("cum").as("cum_n"), col("exact_v"),
        (col("exact_v") >= col("est_bin") * HistW &&
          (col("est_bin") === (HistB - 1) ||
            col("exact_v") < (col("est_bin") + 1) * HistW)).as("in_bin"))
      .orderBy("q")
  }

  /** T59 — PER-SOURCE LENGTH PROFILE: the t55 histogram GROUPED BY
    * source, answering per-source quantiles (p50/p90/p99) from ≤ S·B
    * cells of state — the per-feed stats dashboard a 100 TB ingest
    * operation watches (a crawl feed whose p99 length collapses is
    * broken upstream). Same integer discipline as t55; the exact-rank
    * probe is NOT repeated here (t55 pins the in-bin theorem once —
    * this row is the grouped production form). The per-source
    * cumulative window orders ≤ B bins WITHIN each source partition —
    * a partitioned window over a model-sized frame, never the corpus. */
  val t59SourceLengthProfile: QuerySpec = QuerySpec.sql(
    "t59_source_length_profile",
    s"""WITH v AS (SELECT source, n_chars AS x FROM documents),
       |n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
       |      FROM v GROUP BY 1),
       |h AS (SELECT source, LEAST(x // $HistW, ${HistB - 1}) AS bin,
       |        CAST(COUNT(*) AS BIGINT) AS c
       |      FROM v GROUP BY 1, 2),
       |ch AS (SELECT source, bin, c,
       |        CAST(SUM(c) OVER (PARTITION BY source ORDER BY bin)
       |          AS BIGINT) AS cum
       |      FROM h),
       |t AS (SELECT source, q, (q * n + 99) // 100 AS target_rank
       |      FROM (SELECT unnest([50, 90, 99]) AS q) CROSS JOIN n),
       |eb AS (SELECT t.source, t.q, t.target_rank, MIN(ch.bin) AS est_bin
       |       FROM t JOIN ch ON ch.source = t.source
       |         AND ch.cum >= t.target_rank
       |       GROUP BY 1, 2, 3)
       |SELECT eb.source, eb.q, eb.target_rank, eb.est_bin,
       |  eb.est_bin * $HistW AS est_lo, ch.c AS bin_n, ch.cum AS cum_n
       |FROM eb JOIN ch ON ch.source = eb.source AND ch.bin = eb.est_bin
       |ORDER BY eb.source, eb.q""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val v = Tables.documents(s, d)
      .select(col("source"), col("n_chars").as("x"))
    val n = v.groupBy("source").agg(count(lit(1)).as("n"))
    val h = v.groupBy(col("source"),
      least(expr(s"x div $HistW"), lit(HistB - 1L)).as("bin"))
      .agg(count(lit(1)).as("c"))
    val ch = h.withColumn("cum",
      sum("c").over(Window.partitionBy("source").orderBy("bin")))
      .localCheckpoint()
    val t = Seq(50, 90, 99).toDF("q").crossJoin(broadcast(n))
      .select(col("source"), col("q"),
        expr("(q * n + 99) div 100").as("target_rank"))
    val eb = broadcast(t)
      .join(ch.select(col("source"), col("bin"), col("cum")),
        Seq("source"))
      .filter(col("cum") >= col("target_rank"))
      .groupBy("source", "q", "target_rank").agg(min("bin").as("est_bin"))
    eb.join(ch.select(col("source"), col("bin"), col("c"), col("cum")),
        eb("source") === ch("source") && col("est_bin") === col("bin"))
      .select(eb("source"), col("q"), col("target_rank"), col("est_bin"),
        (col("est_bin") * HistW).as("est_lo"),
        col("c").as("bin_n"), col("cum").as("cum_n"))
      .orderBy("source", "q")
  }

  // ---------------------------------------------------------------
  // t62 — PORTABLE HyperLogLog. CardinalitySketchSpec demonstrates
  // Spark's built-in approx_count_distinct (engine-specific sketch, no
  // oracle possible); this is the ORACLE-ABLE form: registers from the
  // portable md5 base hash, the register sum kept as an EXACT scaled
  // integer (Σ 2^-M_j × 2^HllScale — every term is a dyadic rational,
  // so the sum is a bigint, no float accumulation order), and exactly
  // ONE double op chain (alpha·m²·2^scale / S, same literals, same
  // parenthesization) for the estimate — the FixedLog discipline
  // applied to cardinality estimation.

  private[graft] val HllP = 8 // register index bits
  private[graft] val HllM = 1 << HllP // 256 registers
  /** Scale exponent for the exact register sum: rho ≤ 24 (the base
    * hash carries 31 bits − 8 index bits = 23 payload bits, so the
    * lowest-set-bit position caps at 23 ⇒ rho ≤ 24 ≤ scale). */
  private[graft] val HllScale = 30
  /** HLL bias constant alpha_m for m = 256, inlined as ONE double
    * literal into both engines (Scala Double → shortest-round-trip
    * string → DuckDB double: bit-identical). */
  private[graft] val HllAlpha: Double = 0.7213 / (1 + 1.079 / HllM)

  /** HLL register build from a raw (group, value-string `s`) instance
    * stream — NO distinct needed (registers are duplicate-insensitive):
    * one two-phase max-aggregation, ≤ [[HllM]] state rows per group.
    * rho is the lowest-set-bit position of the hash payload
    * (`length(bin(x & -x))` — bin strips leading zeros in BOTH
    * engines, the FixedLog-pinned contract), 24 for a zero payload
    * (23 payload bits ⇒ positions cap at 23). Shard register frames
    * merge by per-idx MAX — the mergeability theorem `HllSpec` pins
    * against arbitrary doc shards. */
  private[graft] def hllRegisters(si: DataFrame, gcol: String): DataFrame = {
    val hx = si.select(col(gcol), baseHash(col("s")).as("h"))
    hx.select(col(gcol), (col("h") % HllM).as("idx"),
      when(expr("h div 256") === 0, 24)
        .otherwise(expr("length(bin((h div 256) & -(h div 256)))"))
        .as("rho"))
      .groupBy(gcol, "idx").agg(max("rho").as("m"))
  }

  /** (group, n_zero, s_scaled, est) from a register frame — THE
    * estimate arithmetic, factored so the t62 gate and composing
    * consumers (t67's scorecard) can never drift: the exact scaled
    * register sum (every term a dyadic rational → bigint), then the
    * single deterministic double op chain. */
  private[graft] def hllEstimateFrame(regs: DataFrame,
      gcol: String): DataFrame =
    regs.groupBy(gcol)
      .agg((lit(HllM) - count(lit(1))).cast("long").as("n_zero"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllScale - m)")) +
          (lit(HllM) - count(lit(1))) * lit(1L << HllScale))
          .cast("long").as("s_scaled"))
      .withColumn("est",
        lit(HllAlpha) * lit((HllM * HllM).toDouble) *
          lit((1L << HllScale).toDouble) / col("s_scaled").cast("double"))

  /** Per-source distinct-3-gram HLL estimate WITHOUT the t62 gate's
    * corpus-wide exact probe and '__all' union row — the PRODUCTION
    * composition shape (the probe is gate-scale truth only; t62's
    * scaladoc says any production consumer drops it). One scan, one
    * two-phase max-agg, one 20-row estimate frame. */
  private[queries] def hllSourceEst(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    import graft.functions.TextAnalysis.{shingles, tokens}
    val si = graft.Tables.documents(s, d)
      .select(col("source"),
        explode(shingles(tokens(col("text")), 3)).as("s"))
    hllEstimateFrame(hllRegisters(si, "source"), "source")
      .select(col("source"), col("est"))
  }

  /** Raw HLL estimate from a register frame (one row per idx): the
    * exact scaled register sum, then the single deterministic double
    * op chain. Spec-side helper mirroring the t62 gate arithmetic. */
  private[graft] def hllEstimate(regs: DataFrame): Double = {
    val s = regs
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllScale - m)")) +
        (lit(HllM) - count(lit(1))) * lit(1L << HllScale)).cast("long"))
      .collect()(0).getLong(0)
    HllAlpha * (HllM * HllM).toDouble * (1L << HllScale).toDouble / s.toDouble
  }

  /** T62 — HLL CARDINALITY per source (+ the '__all' union row via
    * register max-merge): distinct trigram-shingle count estimated
    * from m = [[HllM]] registers. The scale story is the reason this
    * operator exists: exact COUNT(DISTINCT) re-keys the corpus-sized
    * shingle space through an exchange, while the register build is a
    * two-phase max-aggregation over the RAW instance stream — HLL is
    * duplicate-insensitive, so no distinct, no per-key shuffle, and
    * per-source state is m rows regardless of corpus size. The
    * mergeability theorem rides in the gate itself: the union row is
    * computed by max-merging the per-source registers (never re-reading
    * data), exactly how shard sketches combine at 100 TB. The exact_n
    * probe column is gate-scale truth for error measurement —
    * production reads the sketch alone ([[t55HistQuantiles]]'s probe
    * convention). Estimator: raw HLL (no small-range correction — the
    * correction needs ln(), which is libm and breaks cross-engine
    * cell parity; callers below the linear-counting threshold read
    * n_zero and apply it themselves). */
  val t62HllCardinality: QuerySpec = QuerySpec.sql(
    "t62_hll_cardinality", {
      val rest = "(h // 256)"
      s"""WITH t AS (SELECT doc_id, source, ${TextQueries.ToksSql} AS toks
         |           FROM documents),
         |si AS (SELECT source, unnest(${TextQueries.ShinglesOverToks}) AS s
         |       FROM t),
         |hx AS (SELECT source, ${baseHashSql("s")} AS h FROM si),
         |r AS (SELECT source, h % $HllM AS idx,
         |        CASE WHEN $rest = 0 THEN 24
         |             ELSE length(bin($rest & -$rest)) END AS rho
         |      FROM hx),
         |regs AS (SELECT source, idx, MAX(rho) AS m FROM r GROUP BY 1, 2),
         |uregs AS (SELECT '__all' AS source, idx, MAX(m) AS m
         |          FROM regs GROUP BY 2),
         |allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM uregs),
         |agg AS (SELECT source,
         |        CAST($HllM - COUNT(*) AS BIGINT) AS n_zero,
         |        CAST(SUM(CAST(1 AS BIGINT) << ($HllScale - m))
         |          + ($HllM - COUNT(*)) * (CAST(1 AS BIGINT) << $HllScale)
         |          AS BIGINT) AS s_scaled
         |        FROM allregs GROUP BY 1),
         |dsh AS (SELECT DISTINCT source, s FROM si),
         |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_n
         |       FROM dsh GROUP BY 1
         |       UNION ALL
         |       SELECT '__all', CAST(COUNT(DISTINCT s) AS BIGINT) FROM si)
         |SELECT a.source, a.n_zero, a.s_scaled,
         |  CAST($HllAlpha AS DOUBLE) * CAST(${HllM * HllM} AS DOUBLE)
         |    * CAST(${1L << HllScale} AS DOUBLE)
         |    / CAST(a.s_scaled AS DOUBLE) AS est,
         |  ex.exact_n
         |FROM agg a JOIN ex USING (source)
         |ORDER BY source""".stripMargin
    }) { (s, d) =>
    import graft.functions.TextAnalysis.{shingles, tokens}
    // shingle ONCE, materialize the DISTINCT frame only (r21): HLL
    // registers are duplicate-insensitive, so building them from the
    // distinct (source, s) rows gives byte-identical registers — the
    // former raw-instance checkpoint (one extra corpus materialization
    // + job) bought nothing the distinct didn't already have to pay.
    val si = Tables.documents(s, d)
      .select(col("source"),
        explode(shingles(tokens(col("text")), 3)).as("s"))
    val dsh = si.distinct()
      .localCheckpoint() // one corpus scan: registers + both probes
    val regs = hllRegisters(dsh, "source")
      .localCheckpoint() // per-source rows + the max-merge read it
    val uregs = regs.groupBy("idx").agg(max("m").as("m"))
      .select(lit("__all").as("source"), col("idx"), col("m"))
    val agg = hllEstimateFrame(regs.unionByName(uregs), "source")
    val ex = dsh.groupBy("source").agg(count(lit(1)).as("exact_n"))
      .unionByName(dsh.select("s").distinct()
        .agg(count(lit(1)).as("exact_n"))
        .select(lit("__all").as("source"), col("exact_n")))
    agg.join(ex, "source")
      .select(col("source"), col("n_zero"), col("s_scaled"), col("est"),
        col("exact_n"))
      .orderBy("source")
  }

  val all: Seq[QuerySpec] =
    Seq(t52CmsHeavyHitters, t55HistQuantiles, t59SourceLengthProfile,
      t62HllCardinality)
}

package graft.queries

import org.apache.spark.sql.Column
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

  /** Portable scalar token hash (the minhashBase formula, un-arrayed). */
  private[graft] def baseHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % P

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

  val all: Seq[QuerySpec] =
    Seq(t52CmsHeavyHitters, t55HistQuantiles, t59SourceLengthProfile)
}

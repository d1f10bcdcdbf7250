package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point base-2 logarithm by repeated mantissa squaring — the
  * sub-bit upgrade to the whole-bit surprisal discipline (LmQueries):
  * `log2fp(x) = e·2^F + y ≈ 2^F · log2(x)` for positive BIGINT x,
  * computed with PURE INTEGER arithmetic (bitlen, shift, multiply), so
  * Spark and DuckDB produce bit-identical values — no libm, no float
  * accumulation — at 1/2^F-bit resolution instead of whole bits.
  *
  * Algorithm (classic shift-and-square): e = bitlen(x)−1 is the
  * integer part; the mantissa m normalizes to [2^30, 2^31) and each of
  * F rounds squares it — m² ∈ [2^60, 2^62) always fits signed 64 — and
  * the carry (whether m² reached 2^61·2, i.e. bitlen 62) IS the next
  * fraction bit: `y ← 2y + (bitlen(m²) − 61)`, `m ← m² >> (30 +
  * carry)`. Truncation error stays ≲ F·2^−29 relative — far below the
  * 2^−F quantum — and, critically, the function is the SAME function
  * in both engines, which is all cross-engine exactness needs.
  *
  * Usage shape: callers apply it to MODEL-sized tables (per-(label,
  * word) count rows, per-label totals), never to the corpus instance
  * stream — the scored stream joins the precomputed cost columns. */
object FixedLog {

  /** Fractional bits: resolution 1/256 bit. */
  val F = 8

  /** Scale factor 2^F — `log2fp` output is in units of 1/[[Scale]]
    * bits. */
  val Scale: Long = 1L << F

  /** Append `dst = log2fp(src)` for each (src expression, dst name)
    * pair via 2+F chained projections (each round's mantissa is a real
    * column, computed once — no 3^F expression-tree blowup). `src`
    * must be a positive integer expression; src ≤ 0 (log undefined)
    * or NULL yields NULL, not garbage — bin(0) has length 1, so an
    * unguarded zero count would silently accumulate y = 2y + (1−61)
    * into a large negative "log". The NULL exponent propagates through
    * every round's arithmetic, so one guard covers the chain. */
  def withLog2(df: DataFrame, cols: (String, String)*): DataFrame = {
    var cur = df
    // integer exponent + normalized 30-bit mantissa
    for ((src, dst) <- cols) {
      cur = cur
        .withColumn(s"__e_$dst", expr(
          s"CASE WHEN ($src) > 0 THEN length(bin($src)) - 1 END"))
        .withColumn(s"__m_$dst", expr(
          s"""CASE WHEN __e_$dst IS NULL THEN CAST(NULL AS BIGINT)
             |  WHEN __e_$dst <= 30
             |  THEN shiftleft(CAST(($src) AS BIGINT), 30 - __e_$dst)
             |  ELSE shiftright(CAST(($src) AS BIGINT), __e_$dst - 30)
             |END""".stripMargin))
        .withColumn(s"__y_$dst", lit(0L))
    }
    for (_ <- 1 to F; (_, dst) <- cols) {
      cur = cur
        .withColumn(s"__y_$dst", expr(
          s"2 * __y_$dst + (length(bin(__m_$dst * __m_$dst)) - 61)"))
        .withColumn(s"__m_$dst", expr(
          s"""shiftright(__m_$dst * __m_$dst,
             |  30 + (length(bin(__m_$dst * __m_$dst)) - 61))""".stripMargin))
    }
    for ((_, dst) <- cols)
      cur = cur
        .withColumn(dst, expr(s"__e_$dst * ${Scale}L + __y_$dst"))
        .drop(s"__e_$dst", s"__m_$dst", s"__y_$dst")
    cur
  }

  /** DuckDB twin: a CTE chain `<p>0 … <p>F, <p>z` over relation
    * `from`, appending `dst = log2fp(src)` per pair. Emits the chain
    * BODY (caller splices into its WITH list); the final CTE `<p>z`
    * carries the original columns plus each `dst`. */
  def sqlCtes(from: String, p: String, cols: Seq[(String, String)]): String = {
    val init = cols.map { case (src, dst) =>
      s"""CASE WHEN ($src) > 0 THEN length(bin($src)) - 1 END AS __e_$dst,
         |    CASE WHEN ($src) <= 0 OR ($src) IS NULL THEN CAST(NULL AS BIGINT)
         |      WHEN length(bin($src)) - 1 <= 30
         |      THEN CAST(($src) AS BIGINT) << (30 - (length(bin($src)) - 1))
         |      ELSE CAST(($src) AS BIGINT) >> ((length(bin($src)) - 1) - 30)
         |    END AS __m_$dst, CAST(0 AS BIGINT) AS __y_$dst""".stripMargin
    }.mkString(",\n    ")
    val steps = (1 to F).map { i =>
      val repl = cols.map { case (_, dst) =>
        s"""CASE WHEN length(bin(__m_$dst * __m_$dst)) = 62
           |      THEN (__m_$dst * __m_$dst) >> 31
           |      ELSE (__m_$dst * __m_$dst) >> 30 END AS __m_$dst,
           |    2 * __y_$dst + (length(bin(__m_$dst * __m_$dst)) - 61)
           |      AS __y_$dst""".stripMargin
      }.mkString(",\n    ")
      s"$p$i AS (SELECT * REPLACE (\n    $repl)\n  FROM $p${i - 1})"
    }.mkString(",\n")
    val fin = cols.map { case (_, dst) =>
      s"__e_$dst * $Scale + __y_$dst AS $dst"
    }.mkString(", ")
    val drop = cols.flatMap { case (_, dst) =>
      Seq(s"__e_$dst", s"__m_$dst", s"__y_$dst")
    }.mkString(", ")
    s"""${p}0 AS (SELECT *,
       |    $init
       |  FROM $from),
       |$steps,
       |${p}z AS (SELECT * EXCLUDE ($drop), $fin FROM $p$F)"""
      .stripMargin
  }
}

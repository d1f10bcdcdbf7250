package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE cross-engine rounding convention — one definition, one SQL
  * twin. Round-half-away-from-zero via a branch-explicit floor, so
  * parity with the DuckDB oracle is by construction rather than by
  * trusting two engines' `round()` tie rules. Every scaled-long
  * quantization in the engine (vector scaling, k-means mean
  * re-quantization) MUST go through this pair; keeping a second copy
  * anywhere reintroduces the silent-parity-drift risk this module
  * exists to kill. */
object ExactNum {

  /** Half-away-from-zero rounding; returns an un-cast floor result —
    * callers cast to the integer type they store. */
  def rnd(v: Column): Column =
    when(v >= 0, floor(v + 0.5)).otherwise(-floor(-v + 0.5))

  /** SQL twin of [[rnd]], cast to BIGINT (the only integer type the
    * oracles use). `v` must be a parenthesized double expression. */
  def rndSql(v: String): String =
    s"CAST(CASE WHEN $v >= 0 THEN floor($v + 0.5) ELSE -floor(-$v + 0.5) END AS BIGINT)"
}

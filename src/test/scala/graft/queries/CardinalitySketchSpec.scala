package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextAnalysis.tokens

/** The cardinality-sketch trade, demonstrated: COUNT(DISTINCT) over a
  * corpus-scale key space shuffles every distinct key (at 100 TB the
  * token/shingle key space IS the corpus), while HyperLogLog++
  * (`approx_count_distinct`) ships one fixed-size sketch per partition
  * and merges — constant shuffle bytes at any scale, bounded relative
  * error. Spark's BUILT-IN sketch is engine-specific (its hash and
  * register layout admit no DuckDB oracle), so this spec verifies it
  * by measured error against the exact answer on real corpus keys;
  * the engine's own PORTABLE HLL (t62_hll_cardinality, md5-based
  * registers + exact integer register sums) IS oracle-gated
  * cell-for-cell — see [[SketchQueries.t62HllCardinality]] and
  * `HllSpec`.
  */
class CardinalitySketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("HLL token cardinality lands within 3 standard errors of exact") {
    val toks = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("tok"))
    val rsd = 0.05
    val row = toks.agg(
      countDistinct(col("tok")).as("exact"),
      approx_count_distinct(col("tok"), rsd).as("approx")).collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(exact > 0)
    // rsd is the estimator's relative standard deviation; 3σ is the
    // conventional acceptance band
    assert(math.abs(approx - exact) <= 3 * rsd * exact,
      s"approx=$approx exact=$exact rsd=$rsd")
  }

  test("the sketch aggregate is two-phase with no per-key exchange") {
    val toks = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("tok"))
    val approx = toks.agg(approx_count_distinct(col("tok"), 0.05))
    val p = approx.queryExecution.executedPlan.toString
    // partial sketches merge through the exchange — the plan must NOT
    // re-key on tok (which is what exact distinct does and what a
    // 100 TB key space cannot afford)
    assert("HashAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("hashpartitioning(tok"), p)
  }
}

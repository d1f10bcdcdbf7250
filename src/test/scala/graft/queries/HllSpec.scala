package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextAnalysis.{shingles, tokens}

/** Contracts for the PORTABLE HyperLogLog (t62) — the oracle-able
  * sketch next to CardinalitySketchSpec's engine-builtin demo: exact
  * register mergeability over arbitrary shards (the property that
  * makes the sketch distributable), the estimator's accuracy band on
  * real corpus keys, and duplicate-insensitivity (the reason the build
  * needs no distinct). */
class HllSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def shingleStream(extra: org.apache.spark.sql.Column) =
    Tables.documents(spark, sf)
      .select(extra.as("g"), explode(shingles(tokens(col("text")), 3)).as("s"))

  test("shard registers max-merge to EXACTLY the whole-corpus registers") {
    // arbitrary shards (doc_id parity), not the source grouping the
    // gate uses — mergeability must hold for any partition of the data
    val sharded = SketchQueries.hllRegisters(
      shingleStream((col("doc_id") % 2).cast("int")), "g")
    val merged = sharded.groupBy("idx").agg(max("m").as("m"))
      .select(col("idx"), col("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = SketchQueries.hllRegisters(shingleStream(lit(0)), "g")
      .select(col("idx"), col("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged === whole)
    assert(whole.nonEmpty && whole.size <= SketchQueries.HllM)
  }

  test("duplicate-insensitive: raw instances and distinct values give one register frame") {
    val raw = SketchQueries.hllRegisters(shingleStream(lit(0)), "g")
      .collect().map(r => (r.getLong(1), r.getInt(2))).sorted.toSeq
    val distinctVals = SketchQueries.hllRegisters(
      shingleStream(lit(0)).distinct(), "g")
      .collect().map(r => (r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(raw === distinctVals)
  }

  test("raw estimate within 3 standard errors of exact corpus cardinality") {
    val stream = shingleStream(lit(0))
    val est = SketchQueries.hllEstimate(
      SketchQueries.hllRegisters(stream, "g").drop("g"))
    val exact = stream.select("s").distinct().count().toDouble
    val sigma = 1.04 / math.sqrt(SketchQueries.HllM.toDouble)
    assert(exact > 2.5 * SketchQueries.HllM, "probe must be in the raw regime")
    assert(math.abs(est - exact) <= 3 * sigma * exact,
      s"est=$est exact=$exact sigma=$sigma")
  }
}

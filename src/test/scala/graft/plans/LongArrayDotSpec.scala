package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity contracts for the codegen'd array primitives: `long_dot` /
  * `long_distsq` must equal the higher-order-function forms they
  * replaced, cell for cell, on real embeddings AND on edge shapes
  * (empty, length-mismatched, null arrays). */
class LongArrayDotSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("long_dot equals aggregate(zip_with(*)) on every embedding pair prefix") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          graft.functions.ExactNum.rnd(x.cast("double") * lit(1e6))
            .cast("long")).as("eL"))
      .limit(200)
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") % 7 === col("b.vec_id") % 7)
    val hof = aggregate(zip_with(col("a.eL"), col("b.eL"),
      (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val mismatch = pairs
      .select(call_function("long_dot", col("a.eL"), col("b.eL")).as("fast"),
        hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(mismatch.count() === 0)
  }

  test("long_distsq equals the zip_with squared-difference form") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          graft.functions.ExactNum.rnd(x.cast("double") * lit(1e6))
            .cast("long")).as("eL"))
      .limit(200)
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") % 5 === col("b.vec_id") % 5)
    val hof = aggregate(zip_with(col("a.eL"), col("b.eL"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val mismatch = pairs
      .select(call_function("long_distsq", col("a.eL"), col("b.eL")).as("fast"),
        hof.as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(mismatch.count() === 0)
  }

  test("edge shapes: empty arrays give 0, shorter array bounds the loop, null propagates") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])),
      (Some(Seq(2L, 3L, 5L)), Some(Seq(7L, 11L))), // common prefix: 2·7+3·11
      (None, Some(Seq(1L, 2L)))
    ).toDF("a", "b")
    val out = df.select(
      call_function("long_dot", col("a"), col("b")).as("dot"),
      call_function("long_distsq", col("a"), col("b")).as("dsq"))
      .collect()
    assert(out(0).getAs[Long]("dot") === 0L)
    assert(out(1).getAs[Long]("dot") === 2L * 7 + 3 * 11)
    assert(out(1).getAs[Long]("dsq") === 25L + 64L)
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("non-bigint arrays are coerced at analysis time, not misread at runtime") {
    // SQL integer literals make array<int>; before ImplicitCastInputTypes
    // this was a ClassCastException (interpreted) or byte-offset garbage
    // (codegen over UnsafeArrayData). Now analysis inserts the cast.
    val r = spark.sql(
      "SELECT long_dot(array(1, 2), array(3, 4)) AS d, " +
        "long_distsq(array(1.0, 2.0), array(3.0, 4.0)) AS q").collect()(0)
    assert(r.getAs[Long]("d") === 11L)
    assert(r.getAs[Long]("q") === 8L)
    // an uncastable input type is an ANALYSIS error, not a runtime one
    // (scalars don't implicitly cast to array<bigint>)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT long_dot(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("long_dot") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}

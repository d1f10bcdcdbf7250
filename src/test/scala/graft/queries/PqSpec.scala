package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization contracts beyond the t44/t45 oracle rows:
  * the ADC self-distance identity (ADC(q, enc(q)) is EXACTLY q's own
  * quantization error — the asymmetric-distance algebra, not an
  * approximation), code-space bounds, and the broadcast shape of the
  * ADC scan (codebooks and lookup tables are models, never shuffled).
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every code word has M entries drawn from the k-seed id space") {
    val enc = VectorQueries.t44PqEncode.run(spark, sf)
    val bad = enc.filter(
      size(col("codes")) =!= 4 ||
        exists(col("codes"), c => c < 0 || c >= 8) ||
        col("qerr") < 0)
    assert(bad.count() === 0)
    assert(enc.count() === 500)
  }

  test("ADC distance from a vector to its own codes equals its qerr") {
    // ADC(q, enc(q)) = Σ_m dist(q_m, centroid(code_m(q))) — each term
    // is by definition the subspace quantization error of q, so the
    // total is t44's qerr EXACTLY. A lookup-table indexing bug (wrong
    // sub, off-by-one code, float drift) breaks the identity.
    val enc = VectorQueries.t44PqEncode.run(spark, sf)
      .select(col("vec_id").as("qid"), col("qerr"))
    val selfAdc = VectorQueries.pqSelfAdc(spark, sf)
    val joined = selfAdc.join(enc, "qid")
      .filter(col("adist") =!= col("qerr"))
    assert(joined.count() === 0,
      "ADC(q, enc(q)) != qerr(q) for some query")
    // and t45 delivers exactly top-3 per query
    val top = VectorQueries.t45PqAdcTopk.run(spark, sf)
    assert(top.groupBy("qid").count().filter(col("count") =!= 3).count() === 0)
  }

  test("the ADC scan broadcasts the lookup table — no corpus-side shuffle join") {
    val plan = VectorQueries.t45PqAdcTopk.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "ADC candidate join must be broadcast")
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the statistical-LM curation signals (t48/t49) and the
  * IVF-PQ exact-refine stage (t47), beyond their oracle rows. */
class LmSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("whole-bit log2 identity: length(bin(x)) - 1 == floor(log2(x))") {
    // the surprisal quantization rests on this exactly — for any
    // positive BIGINT, in the engine's own expression (Spark `bin` is
    // Long.toBinaryString; DuckDB's bin is the same digit string)
    // reference is the exact integer floor(log2): 63 - nlz(x). (A float
    // log(x)/log(2) reference is itself off by one at powers of two —
    // the very divergence the bin() trick removes.)
    import spark.implicits._
    val xs = (1L to 4096L) ++ Seq(1L << 20, (1L << 20) + 1, (1L << 62) - 1)
    val expect = xs.map(x => x -> (63 - java.lang.Long.numberOfLeadingZeros(x)))
    val bad = expect.toDF("x", "want")
      .select(col("x"), col("want"), (length(bin(col("x"))) - 1).as("bits"))
      .filter(col("bits") =!= col("want"))
    assert(bad.count() === 0)
  }

  test("t48: surprisal is bounded by the model floor and ceiling") {
    // add-one smoothing bounds every bigram's whole-bit surprisal in
    // [0, bitlen(c1+V)]; the per-doc mean inherits the ceiling from
    // the worst case bitlen(0+V) = the OOV penalty
    val scored = LmQueries.t48BigramLm.run(spark, sf)
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
        .as("tok"))
      .agg(count_distinct(col("tok"))).head.getLong(0)
    val ceil = 64 - java.lang.Long.numberOfLeadingZeros(vocab) // bitlen(V)
    assert(scored.filter(col("nll_bits") < 0).count() === 0)
    assert(scored.filter(col("n_bigrams") > 0 &&
      col("mean_bits") > ceil).count() === 0)
    assert(scored.filter(col("n_bigrams") === 0 &&
      col("mean_bits").isNotNull).count() === 0)
    assert(scored.count() ===
      graft.Tables.documents(spark, sf).count())
  }

  test("t49: the in-domain model prefers in-domain documents") {
    // Moore–Lewis only works if the contrast carries the domain
    // signal: the selected rate among lang='en' docs (the training
    // domain) must exceed the rate among every other language
    val ml = LmQueries.t49MooreLewis.run(spark, sf)
      .join(graft.Tables.documents(spark, sf).select("doc_id", "lang"),
        "doc_id")
      .filter(col("n_bigrams") > 0)
    val rates = ml.groupBy(col("lang") === "en")
      .agg(avg(col("selected").cast("double")).as("rate"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(rates(true) > rates(false),
      s"en selected-rate ${rates(true)} not above non-en ${rates(false)}")
    // and the sign column is exactly the integer nll comparison
    assert(ml.filter(col("selected") =!=
      (col("nll_in") < col("nll_out"))).count() === 0)
  }

  test("t54: the LM gate composes the manifest without losing documents") {
    val m = LmQueries.t54ManifestLm.run(spark, sf).localCheckpoint()
    assert(m.count() === graft.Tables.documents(spark, sf).count())
    // lm_keep is exactly band membership; final_keep the conjunction
    val band = col("mean_bits") >= LmQueries.LmBandLo &&
      col("mean_bits") <= LmQueries.LmBandHi
    assert(m.filter(col("lm_keep") =!=
      (col("mean_bits").isNotNull && band)).count() === 0)
    assert(m.filter(col("final_keep") =!=
      (col("selected") && col("lm_keep"))).count() === 0)
    // the gate must actually gate: strictly fewer final keeps than
    // manifest keeps would be corpus-dependent, so pin the weaker
    // direction that is structural — final ⊆ selected
    assert(m.filter(col("final_keep") && !col("selected")).count() === 0)
  }

  test("t47: refine re-orders within the ADC shortlist, never outside") {
    val adcShort = VectorQueries.t46IvfPq.run(spark, sf)
      .select(col("qid"), col("nid")) // top-3 is a subset of top-R
    val refined = VectorQueries.t47IvfPqRefine.run(spark, sf)
    // exactly 3 per query, exact-cosine-descending by rank
    assert(refined.groupBy("qid").count()
      .filter(col("count") =!= 3).count() === 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy("rank")
    assert(refined.withColumn("prev", lag("cosine", 1).over(w))
      .filter(col("prev").isNotNull && col("cosine") > col("prev"))
      .count() === 0)
    // every refined neighbor came from the ADC candidate pool
    // (rank_adc ≤ RefineR is the shortlist membership witness)
    assert(refined.filter(col("rank_adc") > VectorQueries.RefineR)
      .count() === 0)
    // refine can only help recall@3 vs brute-force truth
    val truth = VectorQueries.t5AnnBruteForce.run(spark, sf)
      .filter(col("rank") <= 3).select(col("qid"), col("nid"))
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      truth.join(df.select("qid", "nid"), Seq("qid", "nid")).count()
    assert(hits(refined) >= hits(adcShort),
      "exact refine lowered recall vs raw ADC ordering")
  }

  test("t56: NB distills the stopword heuristic — held-out fidelity well above chance") {
    // the capability claim: the sub-bit (FixedLog) NB actually LEARNS
    // the target, where whole-bit quantization measurably collapses to
    // one class. 0.75 is a loose floor under the ~0.86 measured.
    val cm = LmQueries.t56NbClassify.run(spark, sf).collect()
    val total = cm.map(_.getAs[Long]("n_docs")).sum
    val correct = cm.map(_.getAs[Long]("n_correct")).sum
    assert(total > 0)
    assert(correct.toDouble / total >= 0.75,
      s"held-out fidelity ${correct.toDouble / total} < 0.75")
    // confusion cells are internally consistent: n_correct counts only
    // diagonal cells, and equals n_docs there
    cm.foreach { r =>
      val diag = r.getAs[String]("label") == r.getAs[String]("pred")
      assert(r.getAs[Long]("n_correct") ===
        (if (diag) r.getAs[Long]("n_docs") else 0L))
    }
  }

  test("t56: every held-out document is scored and predicted exactly once") {
    val cm = LmQueries.t56NbClassify.run(spark, sf).collect()
    val total = cm.map(_.getAs[Long]("n_docs")).sum
    import graft.functions.TextAnalysis.idHashByte
    val heldOut = graft.Tables.documents(spark, sf)
      .filter(!(idHashByte(col("doc_id")) < 205)).count()
    assert(total === heldOut)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests for the curation primitives: the zip_with shingle
  * construction (the hot-path-critical path — see the scaladoc's note
  * on lambda recompute) must equal the naive sliding-window reference
  * for arbitrary inputs, and the canonical tokenizer must be stable
  * under re-normalization. One Spark job per property. */
class TextAnalysisPropSpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, wordGen)
    sep <- Gen.oneOf(" ", "  ", ", ", "! ", " - ")
  } yield ws.mkString(sep)

  test("shingles(n) == naive sliding window over the canonical tokens") {
    val inputs = Gen.listOfN(150, textGen).sample.get
    for (n <- Seq(2, 3, 5)) {
      val got = inputs.toDF("text")
        .select(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), n))
        .collect().map(_.getSeq[String](0).toList)
      val expect = inputs.map { t =>
        val toks = t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
          .split(" ").toList
        if (toks.size >= n) toks.sliding(n).map(_.mkString(" ")).toList
        else List(toks.mkString(" "))
      }
      assert(got.toList == expect, s"n=$n")
    }
  }

  test("normText is idempotent; tokens never contain empties for non-blank input") {
    val inputs = Gen.listOfN(200, textGen).sample.get
    val df = inputs.toDF("text")
    val once = df.select(TextAnalysis.normText(col("text"))).as[String].collect()
    val twice = once.toSeq.toDF("text")
      .select(TextAnalysis.normText(col("text"))).as[String].collect()
    assert(once.toSeq == twice.toSeq)
    val toks = df.select(TextAnalysis.tokens(col("text")))
      .collect().map(_.getSeq[String](0))
    toks.zip(inputs).foreach { case (ts, in) =>
      if (in.exists(_.isLetterOrDigit)) assert(!ts.exists(_.isEmpty), s"in=$in")
    }
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests (SURVEY.md §5.2): run each property over a sampled
  * batch in ONE Spark job per property (not one job per case).
  * Uses raw ScalaCheck `Gen` (the scalatestplus bridge is not in the
  * offline dependency cache). */
class NormalizePropSpec extends SparkSpec {
  import spark.implicits._

  private def runBatch(inputs: Seq[String],
      c: org.apache.spark.sql.Column): Seq[Option[String]] =
    inputs.toDF("v").select(c.cast("string")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getString(0))).toSeq

  test("F2 canonicalize_id is idempotent") {
    val gen = Gen.oneOf(
      Gen.chooseNum(0L, 999999L).map(n => s"$n.0"),
      Gen.chooseNum(0L, 999999L).map(_.toString),
      Gen.alphaStr.map(s => s"id-$s\n"))
    val inputs = Gen.listOfN(200, gen).sample.get
    val once = runBatch(inputs, Normalize.canonicalizeId(col("v")))
    val twice = runBatch(once.map(_.orNull), Normalize.canonicalizeId(col("v")))
    assert(once == twice)
  }

  test("F9 percent is always in [0,100] or null") {
    val rows = Gen.listOfN(300, for {
      u <- Gen.oneOf(7, 19)
      l <- Gen.chooseNum(-10.0, 300.0)
      m <- Gen.chooseNum(-5, 200)
    } yield (u, l, m)).sample.get
    val got = rows.toDF("u", "l", "m")
      .select(Normalize.computePercent(col("u"), col("l"), col("m")))
      .collect()
    got.foreach { r =>
      if (!r.isNullAt(0)) {
        val v = r.getLong(0)
        assert(v >= 0 && v <= 100)
      }
    }
  }

  test("F4 status is total: any input maps to online|offline") {
    val inputs = Gen.listOfN(300,
      Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
        Gen.const(null: String))).sample.get
    val got = runBatch(inputs, Normalize.statusOnlineOffline(col("v")))
    got.foreach(v => assert(v.contains("online") || v.contains("offline")))
  }

  test("A5-style dedup is idempotent (dropDuplicates twice = once)") {
    val rows = Gen.listOfN(300, for {
      a <- Gen.chooseNum(0, 5); b <- Gen.chooseNum(0, 5)
    } yield (a, b)).sample.get
    val df = rows.toDF("a", "b")
    val once = df.dropDuplicates("a", "b")
    val twice = once.dropDuplicates("a", "b")
    assert(once.count() == twice.count())
  }
}

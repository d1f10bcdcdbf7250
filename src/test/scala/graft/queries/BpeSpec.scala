package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis

/** BPE contracts beyond the t50/t51 oracle rows: merge-table algebra
  * (hierarchical closure, count monotonicity) and the segmentation
  * round-trip (units concatenate back to the word — the property that
  * makes a tokenizer lossless). */
class BpeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("merge table: hierarchical closure and non-increasing counts") {
    val merges = BpeQueries.trainMerges(spark, sf).orderBy("round").collect()
    assert(merges.length === 6)
    // each round's pair parts are single chars or previously merged
    // symbols; the merged string is their concatenation
    val known = scala.collection.mutable.Set.empty[String]
    merges.foreach { m =>
      val (w1, w2) = (m.getAs[String]("w1"), m.getAs[String]("w2"))
      assert(w1.length == 1 || known.contains(w1), s"unknown symbol $w1")
      assert(w2.length == 1 || known.contains(w2), s"unknown symbol $w2")
      assert(m.getAs[String]("merged") === w1 + w2)
      known += m.getAs[String]("merged")
    }
    // a later merge can never outcount an earlier one: every occurrence
    // of a post-merge pair maps to an occurrence of some pre-merge pair
    val cnts = merges.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"counts increased across rounds: ${cnts.mkString(",")}")
  }

  test("segmentation round-trips every distinct word") {
    val merges = BpeQueries.trainMerges(spark, sf).orderBy("round").collect()
    val vocab = merges.map(_.getAs[String]("merged")).toSet
    val words = graft.Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "").distinct()
    // re-run the padded-replace chain exactly as t51 builds it
    val sym0 = trim(regexp_replace(col("word"), "(.)", "$1  "))
    val symN = merges.foldLeft(sym0) { (acc, m) =>
      trim(replace(concat(lit(" "), acc, lit(" ")),
        lit(s" ${m.getAs[String]("w1")}  ${m.getAs[String]("w2")} "),
        lit(s" ${m.getAs[String]("merged")} ")))
    }
    val seg = words.select(col("word"), split(symN, "  ").as("units"))
    // lossless: units concatenate back to the word
    assert(seg.filter(concat_ws("", col("units")) =!= col("word"))
      .count() === 0)
    // closed: every unit is a single char or a trained merge
    val units = seg.select(explode(col("units")).as("u"))
      .distinct().collect().map(_.getString(0))
    val bad = units.filterNot(u => u.length == 1 || vocab.contains(u))
    assert(bad.isEmpty, s"units outside vocab: ${bad.take(5).mkString(",")}")
  }

  test("t51 stats: ratio bounds and the zero-token tail") {
    val st = BpeQueries.t51BpeSegment.run(spark, sf)
    assert(st.count() ===
      graft.Tables.documents(spark, sf).count())
    // 1 ≤ units/token (merges only shrink from chars, never below 1)
    assert(st.filter(col("n_tokens") > 0 &&
      (col("units_per_token") < 1 || col("n_units") < col("n_tokens")))
      .count() === 0)
    assert(st.filter(col("n_tokens") === 0 &&
      col("units_per_token").isNotNull).count() === 0)
  }
}

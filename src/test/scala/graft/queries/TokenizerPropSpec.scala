package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests for the two segmentation folds (t76 greedy, t78
  * Viterbi) against INDEPENDENT plain-Scala references — a third
  * implementation next to the Spark fold and the DuckDB oracle, so a
  * shared misunderstanding between the two gated sides would still be
  * caught here. Random words + random vocabularies drawn FROM the
  * words' own substrings (so matches actually occur), fixed by
  * ScalaCheck's sampling; one Spark job per property. */
class TokenizerPropSpec extends SparkSpec {
  import spark.implicits._

  private val wordGen =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  // tiny alphabet → dense substring collisions → vocab pieces fire often

  private def substrings(w: String): Seq[String] =
    for {
      l <- 2 to 4
      s <- 0 to w.length - l
    } yield w.substring(s, s + l)

  /** Reference greedy maximal munch (t76's semantics). */
  private def refGreedy(w: String, pieces: Set[String]): Long = {
    var pos = 0; var units = 0L
    while (pos < w.length) {
      val take = (4 to 2 by -1).find(l =>
        pos + l <= w.length && pieces(w.substring(pos, pos + l)))
        .getOrElse(1)
      pos += take; units += 1
    }
    units
  }

  /** Reference greedy PATH COST under the Viterbi cost model. */
  private def refGreedyCost(w: String, costs: Map[String, Long],
      fb: Long): Long = {
    var pos = 0; var cost = 0L
    while (pos < w.length) {
      val take = (4 to 2 by -1).find(l =>
        pos + l <= w.length && costs.contains(w.substring(pos, pos + l)))
        .getOrElse(1)
      cost += costs.getOrElse(w.substring(pos, pos + take), fb)
      pos += take
    }
    cost
  }

  /** Reference Viterbi DP: lexicographic-min (cost, units). */
  private def refViterbi(w: String, costs: Map[String, Long],
      fb: Long): (Long, Long) = {
    val Inf = (Long.MaxValue / 4, Long.MaxValue / 4)
    val dp = Array.fill(w.length + 1)(Inf)
    dp(0) = (0L, 0L)
    for (i <- 1 to w.length; l <- 1 to math.min(4, i)) {
      val piece = w.substring(i - l, i)
      val c =
        if (l == 1) Some(costs.getOrElse(piece, fb))
        else costs.get(piece)
      c.foreach { cb =>
        val cand = (dp(i - l)._1 + cb, dp(i - l)._2 + 1)
        if (cand._1 < dp(i)._1 ||
          (cand._1 == dp(i)._1 && cand._2 < dp(i)._2)) dp(i) = cand
      }
    }
    dp(w.length)
  }

  private def randomModel(words: Seq[String], pick: Int): Map[String, Long] = {
    val pool = words.flatMap(substrings).distinct.sorted
    val chosen = Gen.pick(math.min(pick, pool.size), pool).sample.get.toSeq
    val chars = words.flatMap(_.toSeq).distinct.map(_.toString)
    // deterministic pseudo-costs in a realistic band
    (chosen ++ chars).distinct.map(p => p -> (3L + (p.hashCode.abs % 9))).toMap
  }

  test("greedy fold == reference greedy for random words and vocabularies") {
    val words = Gen.listOfN(120, wordGen).sample.get.distinct
    val model = randomModel(words, 25)
    val pieces = model.keySet.filter(_.length >= 2)
    val got = words.toDF("word")
      .select(col("word"),
        WordPieceQueries.greedyUnits(col("word"), pieces).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = words.map(w => w -> refGreedy(w, pieces)).toMap
    assert(got == expect)
  }

  test("viterbi fold == reference DP, and is never beaten by the greedy path") {
    val words = Gen.listOfN(120, wordGen).sample.get.distinct
    val model = randomModel(words, 25)
    val fb = 20L
    val got = words.toDF("word")
      .select(col("word"),
        WordPieceQueries.viterbiCostUnits(col("word"), model, fb).as("v"))
      .select(col("word"), col("v.cost"), col("v.units"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    words.foreach { w =>
      val ref = refViterbi(w, model, fb)
      assert(got(w) == ref, s"word=$w")
      // optimality: the greedy path is A path, so Viterbi can only tie
      // or beat its total cost
      assert(ref._1 <= refGreedyCost(w, model, fb), s"word=$w")
    }
  }

  test("segmentation folds are total: 1 <= units <= length") {
    val words = Gen.listOfN(80, wordGen).sample.get.distinct
    val model = randomModel(words, 10)
    val rows = words.toDF("word")
      .select(length(col("word")).as("n"),
        WordPieceQueries.greedyUnits(col("word"),
          model.keySet.filter(_.length >= 2)).as("g"),
        WordPieceQueries.viterbiCostUnits(col("word"), model, 20L)
          .getField("units").as("v"))
      .collect()
    rows.foreach { r =>
      val (n, g, v) = (r.getInt(0), r.getLong(1), r.getLong(2))
      assert(g >= 1 && g <= n && v >= 1 && v <= n, r.toString)
    }
  }
}

package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the fixed-point log2 ([[FixedLog]]) — the sub-bit
  * surprisal quantum t56 scores with. The function need not be exactly
  * floor(2^F·log2(x)) (truncation drift is fine); it MUST be close,
  * monotone, exact on powers of two, and engine-deterministic (the
  * t56 oracle row pins the DuckDB twin cell-for-cell). */
class FixedLogSpec extends SparkSpec {

  private def log2fp(xs: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    FixedLog.withLog2(xs.toDF("x"), "x" -> "lx")
      .collect().map(r => r.getAs[Long]("x") -> r.getAs[Long]("lx")).toMap
  }

  test("within one quantum of 2^F·log2(x) across the magnitude range") {
    val xs = (1L to 100L) ++
      Seq(1000L, 12345L, 999999L, 1L << 31, (1L << 40) + 17, (1L << 62) - 1)
    val got = log2fp(xs)
    xs.foreach { x =>
      val ideal = FixedLog.Scale * math.log(x.toDouble) / math.log(2.0)
      val err = math.abs(got(x) - ideal)
      // truncation always rounds down, never up past the ideal
      assert(err <= 2.0,
        s"log2fp($x) = ${got(x)}, ideal $ideal, err $err")
      assert(got(x) <= ideal + 1e-6)
    }
  }

  test("exact on powers of two, zero at one, monotone nondecreasing") {
    val pows = (0 to 62).map(1L << _)
    val got = log2fp(pows)
    (0 to 62).foreach(e =>
      assert(got(1L << e) === e * FixedLog.Scale))
    val ramp = (1L to 5000L)
    val r = log2fp(ramp)
    ramp.sliding(2).foreach { case Seq(a, b) =>
      assert(r(a) <= r(b), s"not monotone at $a -> $b")
    }
  }

  test("src <= 0 and NULL yield NULL, never a garbage value") {
    import spark.implicits._
    val df = Seq[java.lang.Long](0L, -1L, -12345L, null, 7L)
      .toDF("x")
    val rows = FixedLog.withLog2(df, "x" -> "lx")
      .select(col("x"), col("lx")).collect()
    rows.foreach { row =>
      val x = Option(row.get(0)).map(_.asInstanceOf[Long])
      if (x.exists(_ > 0)) assert(!row.isNullAt(1))
      else assert(row.isNullAt(1),
        s"log2fp(${x.orNull}) should be NULL, got ${row.get(1)}")
    }
    // DuckDB twin parity on the guard: same CTE chain, same contract
    // (pinned by the t56 oracle; here we just pin the Spark side and
    // the chain's null propagation through all F rounds).
  }
}

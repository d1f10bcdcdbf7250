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

  test("distances are exact integers and ties break by centroid id") {
    val e = emb(0L -> Seq(0L), 1L -> Seq(10L), 7L -> Seq(5L)) // equidistant
    val a = KMeans.assign(e,
      e.filter(col("vec_id") < 2).select(col("vec_id").as("cid"), col("eL").as("cL")))
      .filter(col("vec_id") === 7L)
      .select("cid", "distq").as[(Long, Long)].head()
    assert(a == ((0L, 25L)))
  }
}

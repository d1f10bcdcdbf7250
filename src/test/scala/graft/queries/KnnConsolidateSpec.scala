package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t88 consolidation contracts on a HAND graph (the KnnInsertSpec
  * pattern): a degraded node (degree < k) is rebuilt to full degree
  * from its 1/2-hop live neighborhood, an ABSENT node (a t86 repair
  * that emitted nothing) is resurrected through the deterministic
  * hash-fill arm, and healthy nodes pass through byte-identical. The
  * fill targets are recomputed in the test through the same md5
  * convention, so the resurrect assertion is exact, not structural. */
class KnnConsolidateSpec extends SparkSpec {
  import spark.implicits._

  private def v(flips: Int): Array[Float] =
    Array.tabulate(64)(i => if (i < flips) -1.0f else 1.0f)

  private def scored(emb: org.apache.spark.sql.DataFrame) =
    emb.select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))

  /** The engine's hash48(id, i): first 12 hex chars of md5("id:i"). */
  private def hash48(id: Long, i: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16)

  test("degraded node rebuilt, absent node resurrected via hash fill, healthy untouched") {
    // corpus 10=v(0), 20=v(2), 30=v(4), 40=v(6), 50=v(30); k=2.
    // cos(a,b) = (64 − 2·|flips_a − flips_b|)/64
    val emb = Seq((10L, v(0)), (20L, v(2)), (30L, v(4)), (40L, v(6)),
      (50L, v(30))).toDF("vec_id", "embedding")
    val e = scored(emb).localCheckpoint()
    // hand post-CRUD graph: 10 degraded (degree 1), 50 ABSENT,
    // 20/30/40 healthy at k=2 (true cosines)
    val g = Seq(
      (10L, 1L, 20L, 60.0 / 64),
      (20L, 1L, 10L, 60.0 / 64), (20L, 2L, 30L, 60.0 / 64),
      (30L, 1L, 20L, 60.0 / 64), (30L, 2L, 40L, 60.0 / 64),
      (40L, 1L, 30L, 60.0 / 64), (40L, 2L, 20L, 56.0 / 64)
    ).toDF("qid", "rank", "nid", "cosine")

    val out = VectorQueries.graphConsolidate(e, g, k = 2)
      .select("qid", "rank", "nid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    def list(q: Long) = out.filter(_._1 == q).map(x => (x._2, x._3)).toSeq

    // 10 (degree 1): candidates = 1-hop {20} ∪ 2-hop via 20 {30, 40
    // (through 40→20's symmetrized edge)} ∪ fill — exact top-2 is
    // [20, 30] whatever the fill adds (50 is cos 4/64, last)
    assert(list(10L) == Seq((1L, 20L), (2L, 30L)))
    assert(out.filter(_._1 == 10L).map(_._4).toSeq ==
      Seq(60.0 / 64, 56.0 / 64))
    // healthy nodes byte-identical (original ranks AND cosines — 40's
    // hand-written 56/64 proves pass-through, not re-scoring)
    assert(list(20L) == Seq((1L, 10L), (2L, 30L)))
    assert(list(30L) == Seq((1L, 20L), (2L, 40L)))
    assert(list(40L) == Seq((1L, 30L), (2L, 20L)))
    assert(out.filter(x => x._1 == 40L && x._2 == 2L).head._4 == 56.0 / 64)

    // 50 (ABSENT — no hops): resurrected purely from the hash-fill
    // arm; recompute the engine's deterministic targets here and
    // assert the exact rebuilt list
    val ids = Seq(10L, 20L, 30L, 40L, 50L) // pos = rank by vec_id
    val fillTargets = (0L until 2L)
      .map(i => ids((hash48(50L, i) % 5).toInt))
      .filter(_ != 50L).distinct
    val cosTo = Map(10L -> 4.0 / 64, 20L -> 8.0 / 64, 30L -> 12.0 / 64,
      40L -> 16.0 / 64)
    val expect50 = fillTargets.sortBy(t => (-cosTo(t), t))
      .zipWithIndex.map { case (t, r) => ((r + 1).toLong, t) }
    assert(fillTargets.nonEmpty, "hash fill self-collided twice — pick new ids")
    assert(list(50L) == expect50)
    // everything stays degree-capped
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
  }
}

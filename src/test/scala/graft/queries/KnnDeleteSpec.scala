package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t86 delete/repair contracts on a HAND graph: deleted nodes' rows
  * drop; every survivor that pointed at a deleted node re-ranks over
  * its remaining neighbors ∪ the deleted node's live neighbors (the
  * one-hop patch-through); untouched survivors pass through
  * byte-identical; degree degrades honestly when the repair pool is
  * thin (no fabricated edges). */
class KnnDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def v(flips: Int): Array[Float] =
    Array.tabulate(64)(i => if (i < flips) -1.0f else 1.0f)

  private def scored(emb: org.apache.spark.sql.DataFrame) =
    emb.select(col("vec_id"), col("embedding"),
        VectorQueries.scaleL(col("embedding")).as("eL"))
      .withColumn("ss",
        call_function("long_dot", col("eL"), col("eL")).cast("double")
          / lit(1e12))

  test("delete repairs touched nodes through the deleted hub, drops its rows") {
    // 10=v(4), 20=v(5), 30=v(6), 40=v(7): cos = (64−2·|a−b|)/64.
    // 20 is a hub every other node points at; delete it.
    val emb = Seq((10L, v(4)), (20L, v(5)), (30L, v(6)), (40L, v(7)))
      .toDF("vec_id", "embedding")
    val e = scored(emb).localCheckpoint()
    val g = Seq(
      (10L, 1L, 20L, 62.0 / 64), (10L, 2L, 30L, 60.0 / 64),
      (20L, 1L, 10L, 62.0 / 64), (20L, 2L, 30L, 62.0 / 64),
      (30L, 1L, 20L, 62.0 / 64), (30L, 2L, 40L, 62.0 / 64),
      (40L, 1L, 30L, 62.0 / 64), (40L, 2L, 20L, 60.0 / 64)
    ).toDF("qid", "rank", "nid", "cosine")
    val out = VectorQueries.graphDelete(e, g,
        Seq(20L).toDF("vec_id"), k = 2)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("nid"), r.getAs[Double]("cosine")))
      .sortBy(x => (x._1, x._2))

    // the deleted node's own rows are gone
    assert(!out.exists(_._1 == 20L))
    def list(q: Long) = out.filter(_._1 == q).map(x => (x._2, x._3)).toSeq
    // 10: remaining {30} ∪ via-20 {30} → one candidate only — degree
    // honestly degrades to 1 (40 is two hops away; repair is one-hop)
    assert(list(10L) == Seq((1L, 30L)))
    assert(out.filter(_._1 == 10L).head._4 == 60.0 / 64)
    // 30: remaining {40} ∪ via-20 {10} → re-ranked exact
    assert(list(30L) == Seq((1L, 40L), (2L, 10L)))
    // 40: remaining {30} ∪ via-20 {10, 30} → 30 then 10 (58/64)
    assert(list(40L) == Seq((1L, 30L), (2L, 10L)))
    assert(out.filter(x => x._1 == 40L && x._2 == 2L).head._4 == 58.0 / 64)
  }

  test("untouched survivors pass through byte-identical") {
    // 40 points only at 30 and 10 — deleting 20 must not touch it
    val emb = Seq((10L, v(4)), (20L, v(5)), (30L, v(6)), (40L, v(7)))
      .toDF("vec_id", "embedding")
    val e = scored(emb).localCheckpoint()
    val g = Seq(
      (10L, 1L, 20L, 62.0 / 64),
      (30L, 1L, 20L, 62.0 / 64),
      (40L, 1L, 30L, 62.0 / 64), (40L, 2L, 10L, 58.0 / 64)
    ).toDF("qid", "rank", "nid", "cosine")
    val out = VectorQueries.graphDelete(e, g,
        Seq(20L).toDF("vec_id"), k = 2)
      .filter(col("qid") === 40L)
      .select("rank", "nid", "cosine")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(out == Seq((1L, 30L, 62.0 / 64), (2L, 10L, 58.0 / 64)))
  }
}

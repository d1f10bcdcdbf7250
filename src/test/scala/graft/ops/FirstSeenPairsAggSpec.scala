package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.FirstSeenPairsAgg.PairIn

class FirstSeenPairsAggSpec extends SparkSpec {
  import spark.implicits._

  // Same shape as EnrichE2ESpec's locations fixture.
  private val rows = Seq(
    ("105", PairIn("net", "main", 0, "77001")),
    ("105", PairIn("net", "main", 1, "77002")),
    ("105", PairIn("tel", "sec", 2, "88001")),
    ("105", PairIn("fiber", "bak", 3, "99001")), // rank 3 → dropped
    ("212", PairIn("net", "", 4, "55001")))

  test("one-pass aggregator == groupBy+window formulation") {
    val agged = rows.toDS()
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(FirstSeenPairsAgg(keep = 2).toColumn.name("pairs"))
      .collect().toMap

    val p105 = agged("105")
    assert(p105.map(p => (p.primary, p.secondary)) ==
      Seq(("net", "main"), ("tel", "sec")))          // first-seen order, capped
    assert(p105.head.subscribers == Seq("77001", "77002")) // row order
    assert(p105.head.lineId == "77001")
    assert(agged("212").head.lineId == "55001")

    // cross-check against the window formulation on the same data
    val loc = rows.map { case (bid, p) =>
      (p.rowIdx, bid, "addr", p.primary, p.secondary, p.sub) }
      .toDF("row_idx", "branch_id", "address", "primary_desc",
        "secondary_desc", "subscriber")
    val win = Enrich.rankedPairs(loc)
      .orderBy("bid", "rank")
      .select("bid", "primary_desc", "secondary_desc", "subscribers")
      .collect()
      .map(r => (r.getLong(0).toString, r.getString(1), r.getString(2),
        r.getSeq[String](3).toSeq)) // bid is numeric-canonical (long)
    val fromAgg = agged.toSeq.sortBy(_._1).flatMap { case (bid, ps) =>
      ps.map(p => (bid, p.primary, p.secondary, p.subscribers.toSeq))
    }
    assert(win.toSeq.sortBy(t => (t._1, t._2)) == fromAgg.sortBy(t => (t._1, t._2)))
  }

  test("merge across partitions preserves min-first-seen and payload order") {
    val shuffled = rows.reverse
    val agged = shuffled.toDS().repartition(4)
      .groupByKey(_._1).mapValues(_._2)
      .agg(FirstSeenPairsAgg(keep = 2).toColumn.name("pairs"))
      .collect().toMap
    assert(agged("105").map(_.primary) == Seq("net", "tel"))
    assert(agged("105").head.subscribers == Seq("77001", "77002"))
  }
}

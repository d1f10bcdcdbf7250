package graft.queries

import graft.SparkSpec

/** Hand-graph pins for the t81/t81b fixed-point recurrences — the
  * gate oracles prove Spark≡DuckDB on the derived MinHash graph; these
  * prove the recurrence itself does what the scaladoc says, on graphs
  * small enough to hand-compute (truncating division included). */
class GraphQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("propagation on a 3-path + isolate: two hand-computed rounds") {
    // path 1—2—3 (symmetrized), isolate 4; Retain=40 / absorb 60
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val base = Seq((1L, 1000L, 1L), (2L, 2000L, 2L), (3L, 6000L, 1L),
      (4L, 500L, 0L)).toDF("doc_id", "seed_s", "deg")
    // round 1: s=(1600, 2900, 3600, 500)
    // round 2: s1=(40·1000+60·2900)/100=2140
    //          s2=(40·2000+60·((1600+3600) div 2))/100=2360
    //          s3=(40·6000+60·2900)/100=4140; isolate keeps seed
    val got = GraphQueries.propagateScores(edges, base, iters = 2)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2140L), (2L, 2360L), (3L, 4140L),
      (4L, 500L)))
  }

  test("pagerank on a 3-leaf star: one hand-computed round, truncation exact") {
    val s = 1L << 20
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L),
      (1L, 4L), (4L, 1L)).toDF("src", "dst")
    val base = Seq((1L, 0L, 3L), (2L, 0L, 1L), (3L, 0L, 1L),
      (4L, 0L, 1L)).toDF("doc_id", "seed_s", "deg")
    // hub inflow 3·(S div 1): pr=(15S+85·3S) div 100 = 270S div 100
    // leaf inflow S div 3 = 349525: pr=(15S+85·349525) div 100
    val hub = (270L * s) / 100
    val leaf = (15L * s + 85L * (s / 3)) / 100
    val got = GraphQueries.pagerankScores(edges, base, iters = 1)
      .orderBy("doc_id").select("doc_id", "pr")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, hub), (2L, leaf), (3L, leaf), (4L, leaf)))
  }
}

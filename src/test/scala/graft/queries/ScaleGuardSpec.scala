package graft.queries

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Skew guards for the two operators whose worst case is quadratic: a
  * hot LSH bucket (t10) and a stopword token key (t4). These pin the
  * bounded-fan-out behavior the 100 TB plan depends on — the caps must
  * actually remove the degenerate keys from the self-joins. */
class ScaleGuardSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val tmpDirs = scala.collection.mutable.Buffer.empty[String]

  override def afterAll(): Unit = {
    tmpDirs.foreach { dir =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    super.afterAll()
  }

  test("t10 LSH: an over-cap hot bucket is dropped, bounding the self-join") {
    // 40 identical vectors → one hot bucket per table; 2 alternating
    // vectors that share the hot vectors' even-dim signs but not the
    // odd-dim ones, so they escape into their own bucket in table 1
    val hot = (0 until 40).map(i => (i.toLong, Array.fill(64)(1.0f)))
    val rest = Seq(
      (100L, Array.tabulate(64)(d => if (d % 2 == 0) 1.0f else -1.0f)),
      (101L, Array.tabulate(64)(d => if (d % 2 == 0) 1.0f else -1.0f)))
    val emb = (hot ++ rest).toDF("vec_id", "embedding")
    val pairs = VectorQueries.annLshPairs(emb, bits = 4, tables = 2, bucketCap = 10)
      .collect()
    // every bucket containing the 40 clones exceeds the cap and is
    // dropped; only the 2-vector bucket in table 1 survives
    assert(pairs.forall(_.getAs[Long]("qid") >= 100L))
    assert(pairs.length == 2) // directed 100→101 and 101→100
    // no surviving bucket's join input exceeds the cap → per-bucket
    // fan-out is bounded by cap·(cap−1)
    assert(pairs.length <= 10 * 9)
    // the cap is observable, not silent: overflow names the hot buckets
    val over = VectorQueries.annLshOverflow(emb, bits = 4, tables = 2, bucketCap = 10)
      .collect()
    assert(over.nonEmpty && over.forall(_.getAs[Long]("bn") >= 40L))
    // sanity: without the cap the hot bucket join is quadratic
    val uncapped = VectorQueries.annLshPairs(emb, 4, 2, 1000).count()
    assert(uncapped == 42L * 41) // all 42 collide in table 0's bucket
  }

  test("t18 IVF: cluster imbalance is observable, probe fan-out cluster-bounded") {
    // centroids = vec_id < 4; 40 vectors clone centroid 0's direction
    // (one hot cluster), 3 sit near centroid 2
    val hot = (4 until 44).map(i => (i.toLong, Array.fill(64)(1.0f)))
    val cold = (44 until 47).map(i =>
      (i.toLong, Array.tabulate(64)(d => if (d < 32) 1.0f else -1.0f)))
    val cents = Seq(
      (0L, Array.fill(64)(1.0f)),
      (1L, Array.fill(64)(-1.0f)),
      (2L, Array.tabulate(64)(d => if (d < 32) 1.0f else -1.0f)),
      (3L, Array.tabulate(64)(d => if (d % 2 == 0) 1.0f else -1.0f)))
    val emb = (cents ++ hot ++ cold).toDF("vec_id", "embedding")
    val sizes = VectorQueries.ivfClusterSizes(emb, 4)
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n")).toMap
    // the occupancy view surfaces the hot cluster instead of hiding it
    assert(sizes(0L) == 41L) // centroid 0 + its 40 clones
    assert(sizes(2L) == 4L)  // centroid 2 + 3 neighbors
    assert(sizes.values.sum == 47L) // every vector assigned exactly once
    // a query probing nprobe clusters sees at most their occupancy —
    // the sublinear-search contract: candidates ≤ Σ probed sizes
    val ranked = VectorQueries.ivfRanked(emb, 4)
    val probes = ranked.filter(col("crn") <= 2 && col("vec_id") === 44L)
      .select(col("cid")).as[Long].collect().toSet
    val candidates = ranked.filter(col("crn") === 1)
      .filter(col("cid").isin(probes.toSeq: _*)).count()
    assert(candidates <= probes.toSeq.map(sizes).sum)
  }

  test("t4 df cap: a universal stopword no longer fans out the join") {
    // every doc shares "the"; unique tokens otherwise — with the cap
    // live the inverted index has no hot key and the join is empty
    val docs = (0 until 30).map(i => (i.toLong, "en", s"the unique$i token$i"))
      .toDF("doc_id", "lang", "text")
    val capped = TextQueries.ngramJaccardPairs(docs, dfCap = 10, threshold = 0.0)
    assert(capped.count() == 0)
    // without it, the "the" bucket alone produces all C(30,2) pairs
    val uncapped = TextQueries.ngramJaccardPairs(docs, dfCap = 1000, threshold = 0.0)
    assert(uncapped.count() == 30L * 29 / 2)
  }

  test("t4b/t70b fan-in accounting: bucket mass is measured, not assumed") {
    // a 5-deep bucket, a 2-deep bucket, a singleton: max m = 5,
    // candidate mass = C(5,2) + C(2,2) + C(1,2) = 10 + 1 + 0
    val idx = (
      (0 until 5).map(i => (i.toLong, 0, "hot")) ++
      Seq((10L, 0, "warm"), (11L, 0, "warm"), (20L, 1, "solo"))
    ).toDF("doc_id", "band", "bkey")
    assert(TextQueries.bucketFanIn(idx) == (5L, 11L))
    // empty index: the accounting must not NPE on the null aggregates
    assert(TextQueries.bucketFanIn(idx.filter(col("band") < 0)) == (0L, 0L))
    // the C(m,2) arithmetic IS the self-join's output size — pin that
    // equivalence on a real corpus-shaped index so the reported number
    // can be trusted as the join's cost, not just a heuristic
    val pairs = idx.as("a")
      .join(idx.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(pairs == 11L)
  }

  test("t61b budget cap clamps on a fully degenerate corpus (t4c's failure mode)") {
    // the t4c lesson: a flat template vocabulary collapses key
    // selectivity and a fixed screen admits quadratic emission. The
    // winnowing production twin must NOT share that failure mode: its
    // pair-budget cap bounds the join's OUTPUT mass by construction,
    // whatever the df distribution. Worst case — every doc IDENTICAL,
    // every fingerprint hash corpus-hot (df = N):
    val text = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-winnow-degen").toString
    tmpDirs += dir // removed in afterAll — repeated runs must not pile up /tmp
    (0 until 40).map(i => (i.toLong, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // t61's FIXED df cap (50 ≥ N = 40) admits every hash: the join
    // emits all C(40,2) pairs — quadratic in duplication depth
    assert(TextQueries.t61WinnowPairs.run(spark, dir).count() == 40L * 39 / 2)
    // t61b's budget cap measures emission (every hash at df 40 costs
    // C(40,2) = 780 pairs > budget 30·40) and clamps the screen to
    // df ≤ 1 — ZERO pair emission, the query completes bounded
    assert(TextQueries.t61bWinnowPairsProd.run(spark, dir).count() == 0)
  }
}

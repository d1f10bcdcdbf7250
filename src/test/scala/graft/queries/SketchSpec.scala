package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextAnalysis.tokens

/** Count–min contracts beyond the t52 oracle row: per-row mass
  * conservation, the bounded-state guarantee, and the one CMS theorem
  * that matters — estimates NEVER undercount, for every token, not
  * just the probed heavy hitters. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ti = graft.Tables.documents(spark, sf)
    .select(explode(tokens(col("text"))).as("word"))
    .filter(col("word") =!= "")
    .select(col("word"), SketchQueries.baseHash(col("word")).as("h"))

  private def sketch = ti.select(
    posexplode(array((0 until SketchQueries.CmsD).map(j =>
      SketchQueries.bucket(col("h"), j)): _*)).as(Seq("row_id", "bkt")))
    .groupBy("row_id", "bkt").agg(count(lit(1)).as("c"))

  test("every hash row conserves total mass and stays within d·w cells") {
    val n = ti.count()
    val rows = sketch.groupBy("row_id")
      .agg(sum("c").as("mass"), count(lit(1)).as("cells")).collect()
    assert(rows.length === SketchQueries.CmsD)
    rows.foreach { r =>
      assert(r.getAs[Long]("mass") === n,
        s"row ${r.get(0)} lost mass: ${r.getAs[Long]("mass")} != $n")
      assert(r.getAs[Long]("cells") <= SketchQueries.CmsW)
    }
  }

  test("sketches merge: shard sketches cellwise-add to the full sketch") {
    // THE property that makes CMS the distributed/streaming answer: a
    // sketch per partition, day, or microbatch, merged by cell
    // addition, equals the sketch of the union — exactly, not whp
    val docs = graft.Tables.documents(spark, sf)
    def sk(part: org.apache.spark.sql.DataFrame) = part
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .select(SketchQueries.baseHash(col("word")).as("h"))
      .select(posexplode(array((0 until SketchQueries.CmsD).map(j =>
        SketchQueries.bucket(col("h"), j)): _*)).as(Seq("row_id", "bkt")))
      .groupBy("row_id", "bkt").agg(count(lit(1)).as("c"))
    val full = sk(docs)
    val merged = sk(docs.filter(col("doc_id") % 2 === 0))
      .union(sk(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy("row_id", "bkt").agg(sum("c").as("c"))
    assert(full.join(merged, Seq("row_id", "bkt"), "full")
      .filter(full("c").isNull || merged("c").isNull ||
        full("c") =!= merged("c"))
      .count() === 0)
  }

  test("histogram sketch merges: shard histograms cellwise-add to the full one") {
    // the same mergeability theorem as CMS, for the distribution sketch:
    // per-shard equi-width histograms added cell-wise equal the
    // histogram of the union — exactly (counts, not estimates)
    val docs = graft.Tables.documents(spark, sf)
    def hist(part: org.apache.spark.sql.DataFrame) = part
      .groupBy(least(expr(s"n_chars div ${SketchQueries.HistW}"),
        lit(SketchQueries.HistB - 1L)).as("bin"))
      .agg(count(lit(1)).as("c"))
    val full = hist(docs)
    val merged = hist(docs.filter(col("doc_id") % 2 === 0))
      .union(hist(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy("bin").agg(sum("c").as("c"))
    assert(full.join(merged, Seq("bin"), "full")
      .filter(full("c").isNull || merged("c").isNull ||
        full("c") =!= merged("c"))
      .count() === 0)
    assert(full.count() <= SketchQueries.HistB)
  }

  test("every quantile's exact value lands inside its estimated bin") {
    // the histogram-quantile theorem the t55 row carries as `in_bin`:
    // the bin chosen by cum >= target holds ranks (cum_prev, cum], so
    // the exact rank statistic cannot fall outside it
    val out = SketchQueries.t55HistQuantiles.run(spark, sf)
    assert(out.count() === SketchQueries.HistQs.size)
    assert(out.filter(!col("in_bin")).count() === 0)
    // targets are ceil(q·N/100): cum at the chosen bin covers them
    assert(out.filter(col("cum_n") < col("target_rank")).count() === 0)
  }

  test("t59 per-source profile: 3 quantiles per source, targets covered, state bounded") {
    val out = SketchQueries.t59SourceLengthProfile.run(spark, sf)
      .localCheckpoint()
    val s = graft.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(out.count() === s * 3)
    assert(out.filter(col("cum_n") < col("target_rank")).count() === 0)
    assert(out.filter(col("est_bin") >= SketchQueries.HistB).count() === 0)
  }

  test("no estimate undercounts, for every distinct token") {
    val exact = ti.groupBy("word", "h").agg(count(lit(1)).as("exact_n"))
    val probes = exact.select(col("word"), col("exact_n"),
      posexplode(array((0 until SketchQueries.CmsD).map(j =>
        SketchQueries.bucket(col("h"), j)): _*)).as(Seq("row_id", "bkt")))
    val est = probes.join(sketch, Seq("row_id", "bkt"))
      .groupBy("word", "exact_n").agg(min("c").as("est_n"))
    assert(est.filter(col("est_n") < col("exact_n")).count() === 0)
    // and the gate row's probe set is exactly the top-K by exact count
    val out = SketchQueries.t52CmsHeavyHitters.run(spark, sf)
    assert(out.count() === SketchQueries.CmsTopK)
    assert(out.filter(col("over_n") < 0).count() === 0)
  }
}

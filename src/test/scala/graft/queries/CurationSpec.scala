package graft.queries

import graft.SparkSpec

/** Direct library-call specs for the curation cores (the oracle gates
  * t12/t13 at corpus scale; these pin the semantics on crafted docs). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("t66 == rolling up the t28b manifest by source (report and manifest cannot disagree)") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val m = TextQueries.t28bManifestStar.run(spark, sf)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "source")
    val want = m.join(docs, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("n_quality_drop"),
        sum(when(col("keep") && !col("is_keeper"), 1L).otherwise(0L))
          .as("n_dup_drop"),
        sum(when(col("selected") && col("split") === "train", 1L)
          .otherwise(0L)).as("n_train_sel"))
      .select(col("source"), col("n_docs"), col("n_selected"),
        col("n_quality_drop"), col("n_dup_drop"), col("n_train_sel"),
        (col("n_selected").cast("double") / col("n_docs")).as("sel_rate"))
      .orderBy("source")
      .collect().map(_.toSeq).toSeq
    val got = TextQueries.t66SourceCuration.run(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("t67 scorecard rows == the three component gates' rows, source-aligned") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = ScorecardQueries.t67SourceScorecard.run(spark, sf)
      .localCheckpoint()
    val c = TextQueries.t66SourceCuration.run(spark, sf)
      .select("source", "n_docs", "n_selected").localCheckpoint()
    assert(got.count() === c.count()) // every source scored, no '__all'
    assert(got.filter(col("source") === "__all").count() === 0)
    val joined = got.as("g").join(c.as("c"), "source")
      .filter(col("g.n_docs") =!= col("c.n_docs") ||
        col("g.n_selected") =!= col("c.n_selected"))
    assert(joined.count() === 0)
    val f = BpeQueries.t63SourceFertility.run(spark, sf)
      .select(col("source"), col("fertility").as("f2"))
    assert(got.join(f, "source")
      .filter(col("fertility") =!= col("f2")).count() === 0)
  }

  test("t58 source overlap: dense C(S,2) matrix, bounded counts, valid Jaccard") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = TextQueries.t58SourceOverlap.run(spark, sf).localCheckpoint()
    val s = graft.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(out.count() === s * (s - 1) / 2) // every pair, even zero-overlap
    assert(out.filter(col("n_shared") > least(col("n1"), col("n2")))
      .count() === 0)
    assert(out.filter(col("jaccard") < 0 || col("jaccard") > 1)
      .count() === 0)
    // identical shingle sets <-> jaccard 1; the synthetic sources are
    // templated from one vocabulary, so SOME overlap must exist
    assert(out.agg(max("jaccard")).head.getDouble(0) > 0)
  }

  test("t60 winnowing: density guarantee and global-min containment") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val out = TextQueries.t60Winnowing.run(spark, sf).localCheckpoint()
    // the winnowing theorem: every W-window selects a fingerprint, so
    // consecutive selected positions within a doc can differ by at
    // most W (per-doc window over the small fingerprint set)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val gaps = out.withColumn("prev", lag("pos", 1).over(w))
      .filter(col("prev").isNotNull &&
        col("pos") - col("prev") > TextQueries.WinnowW)
    assert(gaps.count() === 0)
    // the per-doc global min hash wins every window it sits in, so it
    // must appear among the selected fingerprints (t9's min-shingle
    // fingerprint is a subset of the winnowing set, hash-wise)
    val minH = out.groupBy("doc_id").agg(min("h").as("mh"))
    val missing = minH.join(out, Seq("doc_id"))
      .groupBy(col("doc_id"), col("mh"))
      .agg(max(when(col("h") === col("mh"), 1).otherwise(0)).as("hit"))
      .filter(col("hit") === 0)
    assert(missing.count() === 0)
    // every non-empty document fingerprints (short docs degrade to one
    // whole-array window, they are not dropped)
    val nDocs = graft.Tables.documents(spark, sf)
      .filter(length(col("text")) > 0).count()
    assert(out.select("doc_id").distinct().count() === nDocs)
  }

  test("t61 winnow pairs: ordered, threshold-respecting, and genuinely shared") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val pairs = TextQueries.t61WinnowPairs.run(spark, sf).localCheckpoint()
    assert(pairs.count() > 0) // threshold bites but does not empty
    assert(pairs.filter(col("d1") >= col("d2")).count() === 0)
    assert(pairs.filter(col("n_shared") < TextQueries.WinnowMinShared)
      .count() === 0)
    // recompute one pair's shared-rare-hash count independently
    val fp = TextQueries.t60Winnowing.run(spark, sf)
      .select("doc_id", "h").distinct().localCheckpoint()
    val dfc = fp.groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= TextQueries.WinnowDfCap)
    val first = pairs.orderBy("d1", "d2").head
    val (d1, d2, n) = (first.getLong(0), first.getLong(1), first.getLong(2))
    val shared = fp.filter(col("doc_id") === d1).join(dfc, "h")
      .select("h").intersect(
        fp.filter(col("doc_id") === d2).join(dfc, "h").select("h"))
      .count()
    assert(shared === n)
  }

  test("decontaminate: copied benchmark text flags, fresh text does not") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // doc 1 embeds a verbatim benchmark span → most shingles overlap
      (1L, "intro words the quick brown fox jumps over the lazy dog outro"),
      // doc 2 shares vocabulary but no 3-gram run
      (2L, "a brown dog and a lazy fox do unrelated things entirely"))
      .toDF("doc_id", "text")
    val r = TextQueries.decontaminate(corpus, bench, 3, 0.2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("flagged"))
    assert(r(1L).getAs[Long]("n_contaminated") >= 7) // the copied run's grams
    assert(!r(2L).getAs[Boolean]("flagged"))
    assert(r(2L).getAs[Long]("n_contaminated") == 0)
    assert(r(2L).getAs[Double]("contamination") == 0.0)
  }

  test("repetitionScore: a looping doc flags; a normal doc scores zero") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "every token here appears exactly once in this text"))
      .toDF("doc_id", "text")
    val r = TextQueries.repetitionScore(docs, 3, 0.3)
      .collect().map(x => x.getLong(0) -> x).toMap
    // 12 tokens → 10 shingles, only 2 distinct ("buy now buy"/"now buy now")
    assert(r(1L).getAs[Long]("n_shingles") == 10)
    assert(r(1L).getAs[Long]("n_distinct") == 2)
    assert(r(1L).getAs[Long]("top_repeat") == 5)
    assert(r(1L).getAs[Boolean]("flagged"))
    assert(r(2L).getAs[Double]("dup_frac") == 0.0)
    assert(!r(2L).getAs[Boolean]("flagged"))
  }
}

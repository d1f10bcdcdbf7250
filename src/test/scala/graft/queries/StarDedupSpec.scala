package graft.queries

import graft.SparkSpec

/** Semantic pins for the scalable dedup variants (t32 star clusters,
  * t34 rep-collapsed pipeline) that the per-query oracle gates cannot
  * express: cross-variant equivalence and the refinement invariant.
  * Runs on the sf0.001 fixture the driver gate also uses. */
class StarDedupSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("t34 rep-collapsed pipeline clusters EQUAL t21 full clusters") {
    // Exact dups share identical shingle sets → identical signatures
    // and band keys, so collapsing them to representatives first loses
    // no connectivity and labels map back to the same component minima.
    val full = TextQueries.t21DupClusters.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    val rep = TextQueries.t34RepDedup.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(rep.length == full.length)
    assert(rep.sameElements(full))
  }

  test("t32 star clusters REFINE t21 full clusters (split-only, never merge)") {
    // Star edges are a subset of the full pair set, so two docs in one
    // star cluster must share a full cluster; the converse may fail
    // (that split cost is what t33 measures).
    val full = TextQueries.t21DupClusters.run(spark, sf)
      .select("doc_id", "cluster_id")
      .withColumnRenamed("cluster_id", "cf")
    val star = TextQueries.t32StarClusters.run(spark, sf)
      .select("doc_id", "cluster_id")
      .withColumnRenamed("cluster_id", "cs")
    val mixed = star.join(full, "doc_id")
      .groupBy("cs")
      .agg(org.apache.spark.sql.functions.countDistinct("cf").as("nf"))
      .filter(org.apache.spark.sql.functions.col("nf") > 1)
      .count()
    assert(mixed == 0L, s"$mixed star clusters span multiple full clusters")
  }

  test("star parity gate is internally consistent") {
    val r = TextQueries.t33StarParity.run(spark, sf).collect().head
    val (nDocs, nAgree) = (r.getLong(0), r.getLong(1))
    val (ncFull, ncStar) = (r.getLong(2), r.getLong(3))
    assert(nAgree <= nDocs)
    assert(ncStar >= ncFull, "refinement can only add clusters")
  }

  test("t35 semantic star clusters REFINE t26 full clusters") {
    val full = ExtraQueries.t26SemanticClusters.run(spark, sf)
      .select("vec_id", "cluster_id").withColumnRenamed("cluster_id", "cf")
    val star = ExtraQueries.t35SemanticStar.run(spark, sf)
      .select("vec_id", "cluster_id").withColumnRenamed("cluster_id", "cs")
    val mixed = star.join(full, "vec_id")
      .groupBy("cs")
      .agg(org.apache.spark.sql.functions.countDistinct("cf").as("nf"))
      .filter(org.apache.spark.sql.functions.col("nf") > 1)
      .count()
    assert(mixed == 0L, s"$mixed star clusters span multiple full clusters")
  }

  test("cosine star edge count is linear: at most one edge per non-hub vector") {
    val edges = ExtraQueries.cosStarEdges(spark, sf)
    val n = edges.count()
    val nVecs = graft.Tables.embeddings(spark, sf).count()
    // one bucket per vector (single-table sign-LSH) → ≤ N − #buckets
    // edges regardless of corpus size; the full pair set is C(m,2)
    // per bucket and has no such bound
    assert(n <= nVecs)
    // d1 is always the bucket-min hub
    assert(edges.filter(org.apache.spark.sql.functions
      .col("d1") >= org.apache.spark.sql.functions.col("d2")).count() == 0)
  }
}

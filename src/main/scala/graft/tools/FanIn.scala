package graft.tools

import graft.spark.Sessions

/** Band-bucket fan-in accounting CLI — the standalone form of the
  * measurement `lshCandidatesOf` runs before its self-join: prints the
  * max bucket membership and the Σ C(m,2) candidate mass of the
  * MinHash band index over a documents dir. This is the number that
  * decides which dedup tier a corpus belongs in BEFORE any quadratic
  * work runs (pairs ↔ star/rep ↔ capped index) — at decade scale it is
  * the cheap alternative to discovering the answer by ENOSPC (the t38
  * ×1000 record).
  *
  * Usage: runMain graft.tools.FanIn [documentsDir]
  */
object FanIn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val bands = graft.queries.TextQueries.bandIndexOf(docs)
      .select("doc_id", "band", "bkey")
    val (m, mass) = graft.queries.TextQueries.bucketFanIn(bands)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[fanin] dir=$dir max_bucket=$m candidate_mass=$mass " +
      f"wall=$wall%.1fs" +
      (if (m > graft.queries.TextQueries.LshHotBucketWarn)
        " VERDICT=hot-buckets: route via star/rep (t32/t34) or a capped index (t38b)"
      else " VERDICT=pair-join safe"))
    spark.stop()
  }
}

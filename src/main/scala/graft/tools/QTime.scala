package graft.tools

import java.nio.file.{Files, Paths}

import graft.spark.Sessions

/** Per-query timing harness for optimization iteration (r20): runs the
  * named queries `reps` times each with the SAME timed action as
  * graft.Bench (`.count()` — methodology parity, so a QTime number is
  * directly comparable to a bench cell), printing every sample plus
  * the min, and optionally dumping `.explain("formatted")` to
  * plans/<tag>/<name>_<tag2>.txt for the judge's plan-claim check.
  *
  * Usage:
  *   runMain graft.tools.QTime [--sf DIR] [--reps N] [--plans DIR/SUFFIX]
  *     query...
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    var sf = "/root/testdata/sf0.1"
    var reps = 3
    var plans: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf" => sf = args(i + 1); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => plans = Some(args(i + 1)); i += 2
        case q => names += q; i += 1
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)
    // job-level breakdown: with --jobs, print each Spark job's wall and
    // description so a multi-job gate (graph builds, iterative walks)
    // shows WHERE its seconds go (guide §1.1's empirical loop, sans UI)
    if (sys.env.contains("QTIME_JOBS")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, (System.nanoTime(),
              Option(j.properties.getProperty("spark.job.description"))
                .getOrElse("")))
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(j.jobId)
            if (s != null) {
              val dt = (System.nanoTime() - s._1) / 1e9
              if (dt > 0.02)
                println(f"[job] ${j.jobId}%4d ${dt}%7.3f s  ${s._2}")
            }
          }
        })
    }
    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      plans.foreach { p =>
        require(p.contains("/"),
          s"--plans expects DIR/SUFFIX (e.g. r21/after), got: $p")
        val Array(dir, suffix) = p.split("/", 2)
        val out = Paths.get("plans", dir, s"${n}_$suffix.txt")
        Files.createDirectories(out.getParent)
        val txt = fn(spark, sf).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(out, txt.getBytes("UTF-8"))
      }
      val ts = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"qtime:$n#$r")
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[qtime] $n run$r $t%.3f s")
        t
      }
      println(f"[qtime] $n MIN ${ts.min}%.3f s over $reps")
    }
    spark.stop()
  }
}

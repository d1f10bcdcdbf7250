package graft

import java.util.Locale

import graft.spark.Sessions

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR
  * four times — a COLD first pass (STARTS from a fresh JVM; only its
  * first queries are truly cold, later ones share the JVM/codegen/
  * footer warmup, so treat cold_total as the meaningful cold number,
  * not the per-query cold timings) and THREE fully-WARM passes — and
  * prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},...} where
  * `value` and `queries` report the per-query MEDIAN of the three warm
  * passes (two consecutive rounds showed uniform ~±20-30% cross-round
  * swings on untouched queries; single warm runs carry no signal),
  * `min_total` (+ full-artifact `queries_min`) the per-query MIN of
  * the warm passes — drift-immune, the cross-round headline on a
  * thermally degrading host (VERDICT r15 item 3) — and `cold_total`
  * carries the cold pass. A `load` stamp
  * (availableProcessors, system load average, epoch seconds) is
  * embedded so cross-round deltas can be discounted when the host was
  * busy, making the artifact self-adjudicating.
  *
  * The printed line rounds per-query seconds to 2 decimals to stay
  * inside the driver's 2000-char stdout tail; full-precision cold+all-
  * warm per-query timings are persisted to bench_out.json alongside
  * it. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // pre-run load: contention that was ALREADY on the host (the
    // end-of-run reading mostly reflects this benchmark itself)
    val loadBefore = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // ABSOLUTE CPU reference probe (r16 finding: uniform thermal
    // capping passes BOTH noise gates — loadavg is low, intra-session
    // drift is low, every query is just uniformly ~1.2× slower, so
    // ratio-based checks are blind to it). A fixed deterministic
    // single-thread integer loop's wall time depends only on the
    // effective clock, giving cross-round comparisons an absolute
    // denominator: same probe time ⇒ totals comparable; probe 1.2×
    // slower ⇒ deflate before comparing.
    def cpuProbe(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < 200000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
      }
      if (x == 42L) System.err.print("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    cpuProbe() // JIT warm-up run — only the timed runs are stamped
    val probeBefore = cpuProbe()
    val spark = Sessions.local(cpus)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // cumulative JVM GC wall time (ms) across all collectors — deltas
    // around a query attribute its GC share, so a cross-round drift can
    // be split into "plan got slower" vs "heap pressure grew"
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    // (name, seconds, gcSeconds, error) — a throwing query is RECORDED,
    // never silently timed as near-zero success
    def pass(): Seq[(String, Double, Double, Option[String])] = queries.map {
      case (name, fn) =>
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable =>
            Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}") }
        (name, (System.nanoTime() - t0) / 1e9, (gcMillis() - g0) / 1e3, err)
    }
    val cold = pass()
    val nRuns = 3 // warm passes; the artifact's "runs" derives from this
    val warmRuns = Seq.fill(nRuns)(pass())
    // per-query median of the warm passes (odd count → true middle
    // element, no averaging), preserving registration order; gc takes
    // the SAME run as the median time (its co-sample, not its own
    // median) so time and gc describe one actual execution
    val warm: Seq[(String, Double, Double, Option[String])] = queries.map {
      case (name, _) =>
        val samples = warmRuns.map(_.find(_._1 == name).get)
        val byTime = samples.sortBy(_._2)
        val med = byTime(byTime.size / 2)
        (name, med._2, med._3, samples.flatMap(_._4).headOption)
    }
    // per-query MIN across warm passes (VERDICT r15 item 3): a host
    // that degrades monotonically across the session (thermal/load
    // drift) inflates every median uniformly, but the fastest warm
    // sample of each query is drift-IMMUNE — it is the least-disturbed
    // observation of the plan. min_total is therefore the headline for
    // cross-round comparison; median stays for continuity.
    val warmMin: Seq[(String, Double, Double, Option[String])] = queries.map {
      case (name, _) =>
        val samples = warmRuns.map(_.find(_._1 == name).get)
        // a throwing pass records its fail-fast time (~0.3 s where the
        // real cost is seconds) — excluding errored samples keeps a
        // flaky query's min from reading as a phantom speedup; a query
        // failing EVERY pass falls back to the raw min (it is excluded
        // from min_total via failedNames anyway)
        val ok = samples.filter(_._4.isEmpty)
        val best = (if (ok.nonEmpty) ok else samples).minBy(_._2)
        (name, best._2, best._3, samples.flatMap(_._4).headOption)
    }
    def fmt(v: Double, dp: Int): String =
      String.format(Locale.ROOT, s"%.${dp}f", Double.box(v))
    def obj(rs: Seq[(String, Double, Double, Option[String])], dp: Int): String =
      rs.map { case (k, v, _, _) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")
    def gcObj(rs: Seq[(String, Double, Double, Option[String])]): String =
      rs.map { case (k, _, g, _) => "\"" + k + "\":" + fmt(g, 3) }
        .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // load stamp: processors + 1-min system loadavg (before AND after
    // the passes) + wall-clock, so a cross-round delta on untouched
    // queries can be checked against host business instead of being
    // read as a code regression; load_avg_before is the discriminating
    // number (after mostly measures this benchmark's own footprint)
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val rt = Runtime.getRuntime
    val probeAfter = cpuProbe()
    val loadJson =
      s"""{"available_processors":${os.getAvailableProcessors},"load_avg_before":${fmt(loadBefore, 2)},"load_avg_after":${fmt(os.getSystemLoadAverage, 2)},"cpu_probe_sec_before":${fmt(probeBefore, 3)},"cpu_probe_sec_after":${fmt(probeAfter, 3)},"epoch_sec":${System.currentTimeMillis() / 1000L},"heap_max_gb":${fmt(rt.maxMemory / 1e9, 2)},"heap_used_gb":${fmt((rt.totalMemory - rt.freeMemory) / 1e9, 2)},"gc_total_sec":${fmt(gcMillis() / 1e3, 1)}}"""
    // union of cold/warm failures, with which pass failed — a query
    // failing only cold or only one warm pass must be visible too; the
    // warm pass index keeps the errors-object keys unique (a query
    // failing every warm pass would otherwise emit duplicate JSON keys)
    val failed = (cold.collect { case (n, _, _, Some(e)) => (n, "cold", e) } ++
      warmRuns.zipWithIndex.flatMap { case (run, i) =>
        run.collect { case (n, _, _, Some(e)) => (n, s"warm${i + 1}", e) }
      })
    val failedNames = failed.map(_._1).distinct
    // totals sum COMPLETING queries only: a failing query's fail-fast
    // exception time (~0.3 s where its real cost is seconds) would make
    // cross-round totals incomparable (ADVICE r11)
    val coldTotal =
      cold.collect { case (n, t, _, _) if !failedNames.contains(n) => t }.sum
    val warmTotal =
      warm.collect { case (n, t, _, _) if !failedNames.contains(n) => t }.sum
    val minTotal =
      warmMin.collect { case (n, t, _, _) if !failedNames.contains(n) => t }.sum
    // HOST-NOISE GATE (VERDICT r14 item 1): r14's committed artifact was
    // captured at load_avg 4.32 with warm passes degrading 132→191 s,
    // making the headline number useless for cross-round comparison.
    // Stamp the artifact as noisy — and say so loudly on stderr — when
    // the host was already busy before the run (load_avg_before > 1.5)
    // or the warm passes drift >15% within the session (a monotonic
    // drift is a loaded-host signature: untouched 1-expression queries
    // cannot slow down between passes of one JVM). The stamp, not a
    // refusal: the driver's per-round run must still produce an
    // artifact, but a noisy one now carries its own disqualification.
    val warmPassTotals = warmRuns.map(run =>
      run.collect { case (n, t, _, _) if !failedNames.contains(n) => t }.sum)
    val warmDrift =
      if (warmPassTotals.isEmpty || warmPassTotals.min <= 0) 0.0
      else (warmPassTotals.max - warmPassTotals.min) / warmPassTotals.min
    val loadNoisy = loadBefore > 1.5
    val driftNoisy = warmDrift > 0.15
    val hostNoisy = loadNoisy || driftNoisy
    if (hostNoisy) System.err.println(
      f"[bench] WARNING: host-noise gate tripped — " +
        f"load_avg_before=$loadBefore%.2f (limit 1.5), " +
        f"warm-pass drift=${warmDrift * 100}%.1f%% (limit 15%%); " +
        "this artifact is NOT comparable cross-round, rerun on an idle host")
    val noiseJson =
      s""""host_noisy":$hostNoisy,"warm_drift_pct":${fmt(warmDrift * 100, 1)},"warm_pass_totals":${warmPassTotals.map(fmt(_, 2)).mkString("[", ",", "]")}"""
    val failedJson = failedNames.map(jstr).mkString("[", ",", "]")
    val errsJson = failed
      .map { case (n, p, e) => jstr(s"$n/$p") + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${fmt(warmTotal, 2)},"unit":"sec","queries":${obj(warm, 2)},"sf":"$sfDir","cold_total":${fmt(coldTotal, 2)},"warm_total":${fmt(warmTotal, 2)},"min_total":${fmt(minTotal, 2)},"runs":$nRuns,"load":$loadJson,$noiseJson,"n_failed":${failedNames.size},"failed":$failedJson,"methodology":"1 cold + $nRuns warm passes; value+queries=per-query median of warm; min_total=sum of per-query MIN of warm (drift-immune cross-round headline); totals exclude failed queries; host_noisy=true disqualifies cross-round median comparison"}"""
    val warmRunsJson = warmRuns.map(obj(_, 4)).mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":${obj(warm, 4)},"queries_min":${obj(warmMin, 4)},"queries_gc":${gcObj(warm)},"queries_cold":${obj(cold, 4)},"queries_cold_gc":${gcObj(cold)},"warm_runs":$warmRunsJson,"sf":"$sfDir","cold_total":$coldTotal,"warm_total":$warmTotal,"min_total":$minTotal,"runs":$nRuns,"load":$loadJson,$noiseJson,"n_failed":${failedNames.size},"failed":$failedJson,"errors":$errsJson,"methodology":"1 cold + $nRuns warm passes over all queries: the cold pass STARTS from a fresh JVM, but later queries in it share JVM/codegen/footer warmup from earlier ones — only cold_total is meaningful as a cold number, per-query queries_cold is not; value+queries report the per-query MEDIAN of the fully-warm passes (warm_runs carries the raw samples); queries_min+min_total report the per-query MIN of the warm passes — drift-immune, the headline for cross-round comparison on a thermally degrading host; queries_gc is each median run's co-sampled JVM GC seconds; totals exclude failed queries (their fail-fast times would skew cross-round comparison); load stamps host conditions + heap/GC totals at exit + an absolute single-thread cpu probe (before/after) so uniform thermal capping — which ratio gates cannot see — is detectable cross-round"}"""
    // belt and braces against log-tail truncation: persist the full
    // artifact to a file, then print the compact line as the process's
    // LAST stdout line (after spark.stop()'s shutdown chatter)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    println(line)
  }
}

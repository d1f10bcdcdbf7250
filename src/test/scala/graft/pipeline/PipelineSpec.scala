package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def df: DataFrame = Seq((1, "a"), (2, "b")).toDF("id", "v")

  test("W2 natural sort: step2 before step10") {
    val names = Seq("step10", "step2", "alpha", "step2b")
    val sorted = names.sortBy(Pipeline.naturalKey)(
      Ordering.Implicits.seqOrdering)
    assert(sorted == Seq("alpha", "step2", "step2b", "step10"))
  }

  test("plan: groups keep order, substeps natural-sorted") {
    val stages = Pipeline.plan(Seq(
      "g2" -> Seq(Stage("g2", "s10", identity), Stage("g2", "s9", identity)),
      "g1" -> Seq(Stage("g1", "x", identity))))
    assert(stages.map(s => s"${s.step}:${s.substep}") ==
      Seq("g2:s9", "g2:s10", "g1:x"))
  }

  test("prune: excludes whole step or step:substep") {
    val stages = Seq(Stage("a", "1", identity), Stage("a", "2", identity),
      Stage("b", "1", identity))
    assert(Pipeline.prune(stages, Set("a")).map(_.step) == Seq("b"))
    assert(Pipeline.prune(stages, Set("a:1")).map(s => s"${s.step}:${s.substep}")
      == Seq("a:2", "b:1"))
  }

  test("parseExcludes: comma-flatten, numeric grammar, invalid collected") {
    val (steps, subs, invalid) = Pipeline.parseExcludes(
      Seq("2, 3.1", "4", " ", "x", "3.1.2", "5.02"))
    assert(steps == Set(2, 4))
    assert(subs == Set((3, 1), (5, 2))) // "5.02" → (5, 2): int() parse
    assert(invalid == Seq("x", "3.1.2")) // warned by the CLI, not fatal
    assert(Pipeline.parseExcludes(Seq())._1.isEmpty)
    // Python int() is unbounded: an over-Int token is a VALID exclude
    // that can never match a step — dropped silently, never fatal,
    // never flagged invalid
    val (s2, p2, inv2) = Pipeline.parseExcludes(
      Seq("4294967296", "1.99999999999", "2"))
    assert(s2 == Set(2) && p2.isEmpty && inv2.isEmpty)
  }

  test("numberedPlan: json consumes step 1 even when missing; empty groups don't") {
    val s = (n: String) => Stage("g", n, identity[DataFrame] _)
    val (plan, warns) = Pipeline.numberedPlan(
      None, // convert_to_json missing → warning, number still consumed
      Seq("A" -> Seq(s("b10"), s("b2")), "EMPTY" -> Seq(), "C" -> Seq(s("c1"))),
      Some(s("excel")))
    assert(warns.size == 1)
    // Reference suffix parity (core/pipeline.py:91) — the f-string path
    // prefix is elided because stages carry no filesystem path.
    assert(warns.head.endsWith("not found; 'convert to json' will be skipped."))
    assert(plan.map(p => (p.step, p.substep)) ==
      Seq((2, Some(0)), (2, Some(1)), (2, Some(2)), // A: meta + sorted subs
        (3, Some(0)), (3, Some(1)), // EMPTY skipped → C is 3
        (4, None))) // excel
    // natural sort within the group: b2 before b10
    assert(plan.filter(_.step == 2).flatMap(_.stage).map(_.substep) ==
      Seq("b2", "b10"))
  }

  test("pruneNumbered: step excludes all substeps; pair excludes one; meta never runs") {
    val s = (n: String) => Stage("g", n, identity[DataFrame] _)
    val (plan, _) = Pipeline.numberedPlan(Some(s("json")),
      Seq("A" -> Seq(s("a1"), s("a2")), "B" -> Seq(s("b1"))), Some(s("excel")))
    def names(st: Set[Int], su: Set[(Int, Int)]) =
      Pipeline.pruneNumbered(plan, st, su).map(_.substep)
    assert(names(Set(), Set()) == Seq("json", "a1", "a2", "b1", "excel"))
    assert(names(Set(2), Set()) == Seq("json", "b1", "excel"))
    assert(names(Set(), Set((2, 2))) == Seq("json", "a1", "b1", "excel"))
    assert(names(Set(1), Set()) == Seq("a1", "a2", "b1", "excel"))
  }

  test("run: failing stage degrades, input flows through, summary records it") {
    val stages = Seq(
      Stage("s", "double", d => d.withColumn("v2", col("id") * 2)),
      Stage("s", "boom", _ => throw new RuntimeException("nope")),
      Stage("s", "add", d => d.withColumn("v3", col("id") + 1)))
    val sum = Pipeline.run(df, stages)
    assert(!sum.allOk && sum.failures.map(_.substep) == Seq("boom"))
    assert(sum.results.map(_.ok) == Seq(true, false, true))
    // boom skipped: both successful stages applied to the surviving frame
    assert(sum.out.columns.toSeq == Seq("id", "v", "v2", "v3"))
    assert(sum.results.forall(_.elapsedS >= 0))
  }

  test("run: checkpoint called once per successful stage") {
    var seen = Vector.empty[String]
    val stages = Seq(
      Stage("s", "a", identity[DataFrame] _),
      Stage("s", "boom", _ => throw new RuntimeException("x")),
      Stage("s", "b", identity[DataFrame] _))
    Pipeline.run(df, stages, (name, _) => seen :+= name)
    assert(seen == Vector("s:a", "s:b"))
  }
}

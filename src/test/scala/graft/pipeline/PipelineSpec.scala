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

package graft.pipeline

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.DataFrame

/** Driver-side stage runner (SURVEY.md §3.1): the reference's pipeline
  * is an ordered list of steps discovered from component directories,
  * natural-sorted, pruned by `--exclude`, each run as a child process
  * with per-step timing and a failure summary that does not abort the
  * run (core/pipeline.py:67-147; cli/command.py:15-94;
  * adapters/script_runner.py:33-84).
  *
  * Here a stage is a named pure `DataFrame => DataFrame`; state crosses
  * stages in memory as an immutable DataFrame (lineage), not through a
  * JSON file on disk — snapshots between stages are an optional
  * `checkpoint` callback (parquet overwrite ≙ the reference's atomic
  * tmp-rename replace, adapters/printers_store.py:38-42). Failures
  * degrade: a failing stage contributes its error to the summary and
  * the previous DataFrame flows on (the reference collects non-zero
  * exit codes and continues, cli/command.py:69-88).
  */
final case class Stage(
    step: String,    // component group, e.g. "tonerFinder"
    substep: String, // script name within the group
    f: DataFrame => DataFrame)

final case class StageResult(
    step: String, substep: String, ok: Boolean,
    elapsedS: Double, error: Option[String])

final case class RunSummary(results: Seq[StageResult], out: DataFrame) {
  /** A11: all-ok flag + failure list (adapters/script_runner.py:82-84). */
  def allOk: Boolean = results.forall(_.ok)
  def failures: Seq[StageResult] = results.filterNot(_.ok)
}

object Pipeline {

  /** Natural sort key: digit runs compare numerically (step2 < step10)
    * over the LOWERCASED name — W2, core/pipeline.py:24-35. */
  def naturalKey(s: String): Seq[(Int, String, Long)] =
    "\\d+|\\D+".r.findAllIn(s.toLowerCase).map { tok =>
      if (tok.forall(_.isDigit)) (0, "", tok.toLong) else (1, tok, 0L)
    }.toSeq

  implicit private val keyOrdering: Ordering[Seq[(Int, String, Long)]] =
    Ordering.Implicits.seqOrdering

  /** Order stages: step groups keep given order; substeps natural-sorted
    * within each group (core/pipeline.py:29-35). */
  def plan(groups: Seq[(String, Seq[Stage])]): Seq[Stage] =
    groups.flatMap { case (_, stages) => stages.sortBy(s => naturalKey(s.substep)) }

  /** `--exclude` pruning (core/pipeline.py:38-64): "step" drops a whole
    * group, "step:substep" drops one script. */
  def prune(stages: Seq[Stage], excludes: Set[String]): Seq[Stage] =
    stages.filterNot(s =>
      excludes.contains(s.step) || excludes.contains(s"${s.step}:${s.substep}"))

  /** Execute in order with per-stage timing; a failing stage logs and is
    * skipped (input flows through). `checkpoint` is called after each
    * successful stage (snapshot-between-steps semantics). */
  def run(input: DataFrame, stages: Seq[Stage],
      checkpoint: (String, DataFrame) => Unit = (_, _) => ()): RunSummary = {
    val (results, out) = stages.foldLeft((Vector.empty[StageResult], input)) {
      case ((acc, df), st) =>
        val t0 = System.nanoTime()
        Try(st.f(df)) match {
          case Success(next) =>
            checkpoint(s"${st.step}:${st.substep}", next)
            val r = StageResult(st.step, st.substep, ok = true,
              (System.nanoTime() - t0) / 1e9, None)
            (acc :+ r, next)
          case Failure(e) =>
            val r = StageResult(st.step, st.substep, ok = false,
              (System.nanoTime() - t0) / 1e9, Some(e.getMessage))
            (acc :+ r, df)
        }
    }
    RunSummary(results, out)
  }
}

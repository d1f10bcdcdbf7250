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

  /** Name-addressed pruning convenience (this engine's stages are named,
    * not numbered): "step" drops a whole group, "step:substep" one
    * script. For the reference's actual numeric `--exclude` grammar see
    * [[parseExcludes]] / [[numberedPlan]] / [[pruneNumbered]]. */
  def prune(stages: Seq[Stage], excludes: Set[String]): Seq[Stage] =
    stages.filterNot(s =>
      excludes.contains(s.step) || excludes.contains(s"${s.step}:${s.substep}"))

  /** The reference's `--exclude` grammar, faithfully (core/pipeline.py:
    * 38-64 + cli/command.py:20-24): the repeatable flag's values are
    * comma-flattened with trim (empties dropped); `\d+` excludes a
    * whole step, `\d+\.\d+` one (step, substep) pair — numeric ids
    * with a DOT, not names — and any other token is returned as
    * invalid so the caller can warn (the CLI prints "[WARN] Ignoring
    * invalid --exclude value", it never aborts). */
  def parseExcludes(
      tokens: Seq[String]): (Set[Int], Set[(Int, Int)], Seq[String]) = {
    val flat = tokens.flatMap(_.split(",", -1)).map(_.trim).filter(_.nonEmpty)
    val steps = Set.newBuilder[Int]
    val subs = Set.newBuilder[(Int, Int)]
    val invalid = Seq.newBuilder[String]
    // Python's int() is unbounded, so huge numeric tokens are VALID
    // excludes that simply never match a real step number — parse
    // overflow must drop them silently (observable-equivalent), never
    // throw and never mark them invalid. `(?U)` matches Python's \d,
    // which accepts Unicode decimal digits ("٣" is a valid step id);
    // Integer.parseInt shares that alphabet via Character.digit.
    flat.foreach {
      case s if s.matches("(?U)\\d+") => s.toIntOption.foreach(steps += _)
      case s if s.matches("(?U)\\d+\\.\\d+") =>
        val Array(a, b) = s.split("\\.")
        for (x <- a.toIntOption; y <- b.toIntOption) subs += ((x, y))
      case s => invalid += s
    }
    (steps.result(), subs.result(), invalid.result())
  }

  /** One numbered plan row (core/pipeline.py:15-21): `substep` None =
    * a step-level script (convertToJson/convertToExcel), 0 = a
    * heading-only meta row (never run, never excludable), 1.. = a
    * component script. */
  final case class PlanItem(step: Int, substep: Option[Int], title: String,
      stage: Option[Stage])

  /** The reference's step NUMBERING (core/pipeline.py:67-147), quirks
    * included: convert-to-json is step 1 and consumes the number even
    * when missing (a warning is emitted and 2 is still the first
    * group); an EMPTY component group consumes no number; each present
    * group gets a substep-0 heading plus natural-sorted substeps 1..n;
    * convert-to-excel takes the next number at the end. */
  def numberedPlan(convertToJson: Option[Stage],
      groups: Seq[(String, Seq[Stage])],
      convertToExcel: Option[Stage]): (Seq[PlanItem], Seq[String]) = {
    val plan = Seq.newBuilder[PlanItem]
    val warns = Seq.newBuilder[String]
    var n = 1
    convertToJson match {
      case Some(st) =>
        plan += PlanItem(n, None, s"Step $n: convertToJson", Some(st))
      case None =>
        // Reference phrasing is f"{conv_json} not found; 'convert to
        // json' will be skipped." (core/pipeline.py:91); stages here
        // carry no filesystem path, so the path prefix is elided.
        warns += "not found; 'convert to json' will be skipped."
    }
    n += 1 // consumed either way (core/pipeline.py:92)
    groups.foreach { case (label, stages) =>
      if (stages.nonEmpty) {
        plan += PlanItem(n, Some(0), s"Step $n: $label", None)
        stages.sortBy(s => naturalKey(s.substep)).zipWithIndex.foreach {
          case (st, i) =>
            plan += PlanItem(n, Some(i + 1),
              s"Step $n.${i + 1}: ${st.substep}", Some(st))
        }
        n += 1 // empty groups consume no number (:98-100)
      }
    }
    convertToExcel match {
      case Some(st) =>
        plan += PlanItem(n, None, s"Step $n: convertToExcel", Some(st))
      case None => // core/pipeline.py:141-143 warns on this branch too
        // f"{conv_excel} not found; 'convert to excel' will be
        // skipped." — path prefix unavailable (no filesystem stage id).
        warns += "not found; 'convert to excel' will be skipped."
    }
    (plan.result(), warns.result())
  }

  /** Exclude application (cli/command.py:56-66): a step-level item is
    * skipped only by its step number; a substep item by its step OR
    * its (step, substep) pair; meta rows are headings and never run
    * regardless. Returns the runnable stages in plan order. */
  def pruneNumbered(plan: Seq[PlanItem], excludeSteps: Set[Int],
      excludeSubs: Set[(Int, Int)]): Seq[Stage] =
    plan.flatMap { it =>
      it.substep match {
        case Some(0) => None // heading
        case None =>
          if (excludeSteps.contains(it.step)) None else it.stage
        case Some(s) =>
          if (excludeSteps.contains(it.step) ||
            excludeSubs.contains((it.step, s))) None
          else it.stage
      }
    }

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

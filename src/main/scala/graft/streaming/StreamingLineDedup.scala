package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextAnalysis

/** Streaming corpus-level LINE dedup: t73's CCNet-style
  * first-occurrence rule applied as documents ARRIVE — the line-tier
  * door next to [[CurationStream.dedupe]] (documents) and the media
  * doors. An arriving document explodes into its
  * [[TextAnalysis.chunkLines]] line units (the SAME chunk definition
  * t73 compiles — one source, the two paths cannot chunk
  * differently); a line instance is emitted iff its md5 has not been
  * seen inside the watermark window, so downstream reassembly sees
  * each repeated boilerplate line exactly once.
  *
  * Retention/parity rule: within a micro-batch the emitted instance
  * for a new hash is the LOWEST [[TextAnalysis.linePosKey]]
  * (doc_id, line_idx) — deterministic under micro-batch iterator
  * reordering — so for a pos-key-ordered stream the emitted set
  * EQUALS t73's batch keeper set over the same prefix
  * (StreamingLineDedupSpec pins the set parity). A repeat arriving
  * after the watermark clears its hash falls through to the periodic
  * batch t73 sweep — the standard two-tier contract.
  *
  * State discipline: one boolean-sized entry per distinct line hash
  * seen inside the window, cleared by event-time timeout — bounded by
  * ingest-rate × delay, never corpus history. */
object StreamingLineDedup {

  final case class SurvivingLine(doc_id: Long, line_idx: Long, line: String)

  /** Seen-marker state: newest member event time drives the timeout. */
  final case class SeenState(maxEventMs: Long)

  /** @param docs  streaming frame with `doc_id`, `text`, and `tsCol`
    * @param tsCol event-time column the watermark rides on
    * @param delay watermark delay; hashes idle that long are cleared */
  def survivors(docs: DataFrame, tsCol: String,
      delay: String): Dataset[SurvivingLine] = {
    import docs.sparkSession.implicits._
    val lines = docs
      .select(col("doc_id"), col(tsCol).as("ts"),
        explode(TextAnalysis.chunkLines(TextAnalysis.tokens(col("text"))))
          .as("l"))
      .select(col("doc_id"), col("ts"), col("l.line_idx"), col("l.line"),
        md5(col("l.line")).as("lh"))
      .withWatermark("ts", delay)
      .as[(Long, Timestamp, Long, String, String)]
    lines
      .groupByKey { case (_, _, _, _, lh) => lh }
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(delay))
  }

  private def process(delay: String)(
      lh: String, rows: Iterator[(Long, Timestamp, Long, String, String)],
      state: GroupState[SeenState]): Iterator[SurvivingLine] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val batch = rows.toSeq
      val maxMs = batch.iterator.map(_._2.getTime)
        .foldLeft(state.getOption.map(_.maxEventMs).getOrElse(0L))(math.max)
      val out =
        if (state.exists) Iterator.empty[SurvivingLine]
        else {
          // first sighting of this hash in the window: the batch's
          // lowest pos-key instance is THE survivor (t73's argmin)
          val (d, _, i, line, _) = batch.minBy {
            case (d, _, i, _, _) => d * 1000000L + i
          }
          Iterator.single(SurvivingLine(d, i, line))
        }
      state.update(SeenState(maxMs))
      state.setTimeoutTimestamp(
        math.max(maxMs, state.getCurrentWatermarkMs() + 1), delay)
      out
    }
  }
}

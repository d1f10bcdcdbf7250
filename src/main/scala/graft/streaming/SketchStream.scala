package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.SketchQueries

/** Streaming forms of the sketch family (CMS frequency, equi-width
  * histogram) — the ingest-side statistics a crawl pipeline maintains
  * while documents ARRIVE, third tier of the streaming curation story
  * next to [[CurationStream]] (exact dedup) and [[StreamingNearDup]]
  * (LSH candidates).
  *
  * The deep reason these stream for free: a sketch IS a bounded-state
  * aggregation. In Structured Streaming a `groupBy(cells).count()`
  * keeps exactly the sketch cells as its running state — ≤ d·w
  * counters for CMS, ≤ B bins for the histogram, REGARDLESS of stream
  * length — so the mergeability theorem the batch SketchSpec pins
  * (shard sketches cellwise-add to the union's sketch) is also the
  * exactly-once incremental-update rule. No custom state handler, no
  * timeout tuning, no compaction: the state bound is the sketch's own
  * theorem, enforced by the same hash expressions the t52/t55 gates
  * pin cell-for-cell against DuckDB.
  *
  * Parity (`SketchStreamSpec`): after any prefix of the stream, the
  * Complete-mode output EQUALS the batch sketch of the documents seen
  * so far — exact counter equality, not approximation — because both
  * sides are the same pure aggregation over the same cell expressions.
  */
object SketchStream {

  /** Running CMS cells over a streaming `documents` frame (`text`):
    * (row_id, bkt, c). State: ≤ CmsD·CmsW rows. */
  def cmsCells(docs: DataFrame): DataFrame = {
    import graft.functions.TextAnalysis.tokens
    docs
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .select(SketchQueries.baseHash(col("word")).as("h"))
      .select(posexplode(array((0 until SketchQueries.CmsD).map(j =>
        SketchQueries.bucket(col("h"), j)): _*)).as(Seq("row_id", "bkt")))
      .groupBy("row_id", "bkt")
      .agg(count(lit(1)).as("c"))
  }

  /** Running length histogram over a streaming `documents` frame
    * (`n_chars`): (bin, c). State: ≤ HistB rows. */
  def histogram(docs: DataFrame): DataFrame =
    docs
      .groupBy(least(expr(s"n_chars div ${SketchQueries.HistW}"),
        lit(SketchQueries.HistB - 1L)).as("bin"))
      .agg(count(lit(1)).as("c"))

  /** Running per-source HLL registers over a streaming `documents`
    * frame (`source`, `text`): (source, idx, m) — the t62 cardinality
    * sketch maintained AT INGEST. The running state is a max-agg over
    * the same register expressions the t62 gate pins cell-for-cell,
    * so state is ≤ sources × [[SketchQueries.HllM]] rows regardless of
    * stream length, and after any prefix the Complete-mode output
    * EQUALS the batch register build of the documents seen so far
    * (max, like count, needs no retraction under append-only input).
    * Publishing an estimate (or the '__all' union row) from a
    * register snapshot is the same downstream arithmetic t62 gates —
    * exactly how shard sketches finalize at 100 TB. */
  def hllRegisters(docs: DataFrame): DataFrame = {
    import graft.functions.TextAnalysis.{shingles, tokens}
    SketchQueries.hllRegisters(
      docs.select(col("source"),
        explode(shingles(tokens(col("text")), 3)).as("s")),
      "source")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis.tokens
import graft.queries.BpeQueries

/** Streaming form of the per-source tokenizer-fit rollup (t63's
  * fertility) — the fourth tier of the streaming curation story next
  * to [[CurationStream]], [[StreamingNearDup]] and [[SketchStream]]:
  * the running token/unit mass a crawl pipeline maintains per source
  * while documents ARRIVE, so a mixing decision (t40's consumer) can
  * read current fertility without a batch sweep.
  *
  * The BUILD/SERVE split is the t63/t51 one made streaming: the merge
  * model is TRAINED in the periodic batch tier
  * ([[BpeQueries.trainMerges]] — an M-row collected artifact) and
  * rides into this leg's plan as literals via the SAME
  * [[BpeQueries.unitsOf]] fold the batch gates compile, so the
  * streamed units can never drift from t51/t63's. Per-token
  * segmentation is a stateless projection; the only state is the
  * running (n_tokens, n_units) pair per source — 2 counters × sources
  * regardless of stream length, the [[SketchStream]] bounded-state
  * discipline (sums, like counts and register maxes, need no
  * retraction under append-only input).
  *
  * Note the streamed form segments each token INSTANCE in-row, where
  * batch t63 segments each DISTINCT word once and joins — identical
  * results by construction (units is a pure function of the word), a
  * different cost trade: the stream has no standing vocab frame to
  * join, and a per-micro-batch distinct would be state the sketch
  * discipline forbids. A production deployment caching hot words in a
  * broadcast dictionary slots in at exactly this seam.
  * `StreamingScorecardE2ESpec` pins the AvailableNow finalize against
  * the batch t67 row set. */
object TokenizerStream {

  /** Running per-source (n_tokens, n_units) over a streaming
    * `documents` frame (`source`, `text`), scored by the trained
    * `merges` model. Complete-mode output; fertility = n_units /
    * n_tokens is the consumer's one division at publish time. */
  def fertility(docs: DataFrame, merges: Array[Row]): DataFrame =
    docs
      .select(col("source"),
        explode(filter(tokens(col("text")), w => w =!= "")).as("word"))
      .select(col("source"), BpeQueries.unitsOf(col("word"), merges).as("units"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum("units").as("n_units"))

  /** The same running rollup under the WORDPIECE model — the t76
    * greedy fold ([[graft.queries.WordPieceQueries.greedyUnits]],
    * literal piece maps, row-local) swapped in for the merge replay;
    * identical bounded state, identical plan shape, so a deployment
    * can stream BOTH families' fertility side by side and read the
    * comparison t75/t76's scaladocs promise. Spec-pinned against the
    * batch per-source rollup over the same prefix
    * (`TokenizerStreamSpec`). */
  def fertilityWordpiece(docs: DataFrame, pieces: Set[String]): DataFrame =
    docs
      .select(col("source"),
        explode(filter(tokens(col("text")), w => w =!= "")).as("word"))
      .select(col("source"),
        graft.queries.WordPieceQueries.greedyUnits(col("word"), pieces)
          .as("units"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum("units").as("n_units"))

  /** The rollup under the UNIGRAM-LM VITERBI model (t78's row-local
    * lattice DP with literal whole-bit piece costs) — the third
    * tokenizer family at the door, completing the streaming symmetry
    * for all three batch-gated segmenters (BPE t51/t63, WordPiece
    * t76, unigram Viterbi t78). Same bounded per-source counter
    * state, same stateless segmentation projection. */
  def fertilityViterbi(docs: DataFrame, costs: Map[String, Long],
      fb: Long): DataFrame =
    docs
      .select(col("source"),
        explode(filter(tokens(col("text")), w => w =!= "")).as("word"))
      .select(col("source"),
        graft.queries.WordPieceQueries.viterbiCostUnits(col("word"), costs, fb)
          .getField("units").as("units"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum("units").as("n_units"))
}

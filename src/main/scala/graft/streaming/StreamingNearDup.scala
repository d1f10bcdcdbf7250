package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextAnalysis

/** Streaming MinHash-LSH near-dup detection: the t2 band-bucket
  * candidate rule applied as documents ARRIVE — the second tier of the
  * streaming curation story next to [[CurationStream]]'s exact dedup.
  * A new document joins each of its B band buckets; every bucket
  * member it agrees with on ≥ K/2 signature elements (est. Jaccard ≥
  * 0.5) emits a candidate pair immediately, so a crawl pipeline can
  * route near-duplicates at the door instead of waiting for the batch
  * sweep.
  *
  * Parity: the banding/signature math is [[TextAnalysis]]'s SHARED
  * operating point (the same expressions t2 compiles into its plan),
  * so over the same corpus the emitted pair SET equals the batch
  * operator's output — `StreamingNearDupSpec` pins set-equality
  * against `t2_minhash_lsh`. A pair sharing several bands emits once
  * per shared band (the batch DISTINCT is a shuffle the stream does
  * not pay); sinks that need exactly-once pairs dedup on (d1, d2)
  * downstream, or rely on the periodic batch backstop.
  *
  * State discipline (the scale story): state is per (band, bucket) —
  * the member list of (docId, signature) — bounded two ways. An
  * event-time timeout clears buckets `delay` past their newest
  * member, so state tracks ingest-rate × window, not corpus history.
  * And a `bucketCap` stops member ACCUMULATION in degenerate hot
  * buckets (near-duplicate pile-ups), bounding per-record compare
  * cost at cap·B — the streaming twin of t38b's bounded standing
  * index: retention keeps the `cap` LOWEST doc_ids seen (a full
  * bucket evicts its largest id for a smaller arrival), the same
  * rule as the batch index's ROW_NUMBER-by-doc_id cap, so for an
  * id-ordered stream the retained set equals the batch capped index
  * over the same prefix and the emitted pair set matches the batch
  * contract exactly (StreamingNearDupSpec pins the parity). */
object StreamingNearDup {

  final case class NearDupCandidate(d1: Long, d2: Long, sigMatches: Int,
      sigFrac: Double)

  /** One bucket's state: members in arrival order (newest first) and
    * the newest member event time (drives the timeout). */
  final case class BucketState(members: List[(Long, Seq[Long])],
      maxEventMs: Long)

  private val K = TextAnalysis.MinhashK

  /** @param docs   streaming frame with `doc_id`, `text`, and `tsCol`
    * @param tsCol  event-time column the watermark rides on
    * @param delay  watermark delay; buckets idle that long are cleared
    * @param bucketCap max members retained per band bucket */
  def candidates(docs: DataFrame, tsCol: String, delay: String,
      bucketCap: Int = 200): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    val sigs = docs
      .select(col("doc_id"), col(tsCol).as("ts"),
        TextAnalysis.minhashSignature(col("text")).as("sig"))
      .withWatermark("ts", delay)
    val bands = sigs
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(TextAnalysis.lshBandKeys(col("sig")))
          .as(Seq("band", "bkey")))
      .as[(Long, Timestamp, Seq[Long], Int, String)]
    bands
      .groupByKey { case (_, _, _, band, bkey) => s"$band:$bkey" }
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(bucketCap, delay))
  }

  private def process(bucketCap: Int, delay: String)(
      key: String, rows: Iterator[(Long, Timestamp, Seq[Long], Int, String)],
      state: GroupState[BucketState]): Iterator[NearDupCandidate] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val st = state.getOption.getOrElse(BucketState(Nil, 0L))
      var members = st.members
      var maxMs = st.maxEventMs
      val out = List.newBuilder[NearDupCandidate]
      // deterministic within-batch order: micro-batch iterators carry
      // no ordering guarantee, so process by (event time, id)
      rows.toSeq.sortBy { case (id, ts, _, _, _) => (ts.getTime, id) }
        .foreach { case (id, ts, sig, _, _) =>
          members.foreach { case (mid, msig) =>
            if (mid != id) {
              val m = sig.iterator.zip(msig.iterator)
                .count { case (a, b) => a == b }
              if (m >= K / 2)
                out += NearDupCandidate(math.min(id, mid), math.max(id, mid),
                  m, m.toDouble / K)
            }
          }
          // re-crawls of an already-held id add nothing; the cap stops
          // accumulation (not matching) in degenerate hot buckets.
          // Retention rule = the LOWEST doc_ids seen (t38b's
          // DeltaIndexCap standing-index contract): a full bucket
          // evicts its largest id for a smaller arrival, so the
          // retained set is arrival-order independent and — for an
          // id-ordered stream — equals the batch operator's capped
          // index over the same prefix (StreamingNearDupSpec pins it).
          if (!members.exists(_._1 == id)) {
            if (members.size < bucketCap) members = (id, sig) :: members
            else {
              val evict = members.maxBy(_._1)
              if (id < evict._1)
                members = (id, sig) :: members.filterNot(_._1 == evict._1)
            }
          }
          maxMs = math.max(maxMs, ts.getTime)
        }
      state.update(BucketState(members, maxMs))
      // timeout must sit strictly past the current watermark; a stale
      // bucket's newest member may already be behind it
      state.setTimeoutTimestamp(
        math.max(maxMs, state.getCurrentWatermarkMs() + 1), delay)
      out.result().iterator
    }
  }
}

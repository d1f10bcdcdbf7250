package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.multimodal.Multimodal

/** Streaming-ingest dedup for MEDIA: [[CurationStream.dedupe]]'s
  * watermark-bounded exact-dedup contract with t1's normalized-text
  * hash replaced by the m8 DECODED-raster signature — the same pixels
  * arriving as PNG today and BMP tomorrow (or recompressed by a
  * mirror) are one piece of content at the door, which no byte-level
  * content hash can see. State discipline is identical:
  * `dropDuplicatesWithinWatermark` holds a signature only until the
  * watermark passes it, so state tracks ingest-rate × window; a
  * re-encode arriving after the window falls through to the periodic
  * batch m8 sweep — the standard two-tier contract.
  */
object MediaStream {

  /** Watermark-bounded streaming raster dedup. `media` carries
    * (`media_id`, `content` binary, `tsCol`); first arrival of each
    * decoded raster inside the window wins. Bytes no installed codec
    * can decode have NO raster identity and are dropped here — a real
    * pipeline routes them to a quarantine sink, and nothing
    * downstream can safely dedup what it cannot decode. */
  def dedupeRaster(media: DataFrame, tsCol: String,
      delay: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("content"), col(tsCol).as("__ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes, ts) =>
          (id, ts, Multimodal.rasterSigOf(bytes).map(_._3).getOrElse(""))
        }
      }
      .toDF("media_id", tsCol, "raster_sig")
      .filter(col("raster_sig") =!= "")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("raster_sig")
  }

  /** Watermark-bounded streaming PERCEPTUAL dedup — [[dedupeRaster]]
    * with the m8 exact-raster signature replaced by the m9 dHash key,
    * completing the batch/streaming symmetry the text tier has
    * (t1 ↔ dedupe, t38b ↔ StreamingNearDup): a re-encode with a small
    * pixel-level perturbation now dedups AT THE DOOR instead of
    * waiting for the periodic batch m9 sweep. The key is the same
    * [[Multimodal.dHash64]] the batch gate groups on (one hash
    * definition, no drift possible), so over an id-ordered prefix the
    * streamed survivor set equals the batch keeper set
    * (`MediaStreamSpec` pins it). Same quarantine rule: bytes no
    * codec can decode — or images smaller than the dHash grid, which
    * HAVE no perceptual identity — are dropped here and fall to the
    * batch sweep's conventions. State is one 64-bit key per distinct
    * hash inside the window: ingest-rate × delay bounded, and 8 bytes
    * where the raster signature holds an md5 string. */
  def dedupePerceptual(media: DataFrame, tsCol: String,
      delay: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("content"), col(tsCol).as("__ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes, ts) =>
          Multimodal.imageHashOf(bytes).map(h => (id, ts, h))
        }
      }
      .toDF("media_id", tsCol, "dhash")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("dhash")
  }

  /** [[dedupePerceptual]]'s AUDIO twin — the m11 block-mean PCM hash
    * at the door: clips are decoded by the shared [[Multimodal]] PCM
    * contract (16-bit mono LE; WAV fast path or AudioSystem) and
    * keyed by [[Multimodal.aHash64Pcm]], so a re-encode or a clip
    * with small sum-preserving sample perturbations dedups at ingest
    * while exact byte/PCM hashing would see distinct content. Same
    * quarantine rule: undecodable bytes and clips shorter than 64
    * samples (no perceptual identity) are dropped to the batch
    * sweep's conventions. State: one 64-bit key per distinct hash in
    * the window. */
  final case class MediaDupCandidate(d1: Long, d2: Long, dist: Int)

  /** One band bucket's state: retained (mediaId, dhash) members —
    * newest first — and the newest event time (drives the timeout). */
  final case class HashBucketState(members: List[(Long, Long)],
      maxEventMs: Long)

  /** HAMMING-TOLERANT near-dup candidates at the door — the
    * [[StreamingNearDup]] machinery with the MinHash signature compare
    * replaced by the m16 popcount rule: each arriving image's dHash
    * splits into `bands` slices, the arrival joins each slice's
    * bucket, and every retained member within hamming ≤ `maxDist`
    * emits a candidate pair immediately. [[dedupePerceptual]] catches
    * EXACT-hash re-encodes at the door; this tier catches the
    * one-bit-off ones that otherwise wait for the batch m16 sweep —
    * the streaming third of the perceptual story (door exact → door
    * fuzzy → batch clusters), each tier sharing the batch operators'
    * own key math ([[Multimodal.dHash64]], the band split, the
    * popcount cut) so no tier can drift from the sweep that backstops
    * it.
    *
    * The band screen is exact for maxDist < bands (pigeonhole), so
    * within a bucket's retention the emitted pair set is complete. A
    * pair within ≤ maxDist shares ≥ bands − maxDist bands and emits
    * once per shared band (the batch DISTINCT is a shuffle the stream
    * does not pay) — sinks dedup on (d1, d2) or rely on the batch
    * backstop, the [[StreamingNearDup]] convention. State per
    * (band, bval) bucket is capped at `bucketCap` members retained by
    * LOWEST media_id (t38b's bounded-standing-index rule — arrival-
    * order independent) and cleared by event-time timeout `delay`
    * past the newest member. Undecodable bytes have no perceptual
    * identity and are dropped (the quarantine rule). */
  def nearDupCandidates(media: DataFrame, tsCol: String, delay: String,
      maxDist: Int = 2, bands: Int = 4,
      bucketCap: Int = 200): Dataset[MediaDupCandidate] = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media
      .select(col("media_id"), col("content"), col(tsCol).as("__ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes, ts) =>
          Multimodal.imageHashOf(bytes).map(h => (id, ts, h))
        }
      }
      .toDF("media_id", "__ts", "dhash")
      .withWatermark("__ts", delay)
    nearDupCandidatesHashed(hashed, maxDist, bands, bucketCap, delay)
  }

  /** [[nearDupCandidates]]' AUDIO twin — the same band-bucket state
    * machinery over [[Multimodal.aHash64Pcm]] (the m18 hash space):
    * clips within hamming ≤ maxDist of a retained arrival emit
    * candidate pairs at the door. Undecodable bytes and sub-64-sample
    * clips have no perceptual identity and are dropped (the
    * [[dedupeAudio]] quarantine rule). */
  def nearDupCandidatesAudio(media: DataFrame, tsCol: String, delay: String,
      maxDist: Int = 2, bands: Int = 4,
      bucketCap: Int = 200): Dataset[MediaDupCandidate] = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media
      .select(col("media_id"), col("content"), col(tsCol).as("__ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions(_.flatMap { case (id, bytes, ts) =>
        Multimodal.audioHashOf(bytes).map(h => (id, ts, h))
      })
      .toDF("media_id", "__ts", "dhash")
      .withWatermark("__ts", delay)
    nearDupCandidatesHashed(hashed, maxDist, bands, bucketCap, delay)
  }

  /** Hash-agnostic core shared by the image and audio doors: band-
    * split the watermarked (media_id, __ts, dhash) frame and run the
    * bucket state machine. Callers OWN the decode and the watermark;
    * this owns the candidate semantics, so the two modalities cannot
    * diverge on retention, ordering, or emission rules. */
  private def nearDupCandidatesHashed(hashed: DataFrame, maxDist: Int,
      bands: Int, bucketCap: Int,
      delay: String): Dataset[MediaDupCandidate] = {
    Multimodal.requireBandScreen(maxDist, bands)
    val spark = hashed.sparkSession
    import spark.implicits._
    Multimodal
      .bandSlices(hashed.select(col("media_id").as("mediaId"),
        col("__ts"), col("dhash")), bands)
      .select(col("mediaId"), col("__ts"), col("dhash"),
        col("band"), col("bval"))
      .as[(Long, Timestamp, Long, Int, Long)]
      .groupByKey { case (_, _, _, band, bval) => s"$band:$bval" }
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(maxDist, bucketCap, delay))
  }

  private def process(maxDist: Int, bucketCap: Int, delay: String)(
      key: String, rows: Iterator[(Long, Timestamp, Long, Int, Long)],
      state: GroupState[HashBucketState]): Iterator[MediaDupCandidate] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val st = state.getOption.getOrElse(HashBucketState(Nil, 0L))
      var members = st.members
      var maxMs = st.maxEventMs
      val out = List.newBuilder[MediaDupCandidate]
      // micro-batch iterators carry no ordering guarantee — process by
      // (event time, id) so within-batch emission is deterministic
      rows.toSeq.sortBy { case (id, ts, _, _, _) => (ts.getTime, id) }
        .foreach { case (id, ts, h, _, _) =>
          members.foreach { case (mid, mh) =>
            if (mid != id) {
              val dist = java.lang.Long.bitCount(h ^ mh)
              if (dist <= maxDist)
                out += MediaDupCandidate(
                  math.min(id, mid), math.max(id, mid), dist)
            }
          }
          // retention = the LOWEST media_ids seen (t38b's standing-
          // index contract): a full bucket evicts its largest id for a
          // smaller arrival — arrival-order independent
          if (!members.exists(_._1 == id)) {
            if (members.size < bucketCap) members = (id, h) :: members
            else {
              val evict = members.maxBy(_._1)
              if (id < evict._1)
                members = (id, h) :: members.filterNot(_._1 == evict._1)
            }
          }
          maxMs = math.max(maxMs, ts.getTime)
        }
      state.update(HashBucketState(members, maxMs))
      // timeout must sit strictly past the current watermark
      state.setTimeoutTimestamp(
        math.max(maxMs, state.getCurrentWatermarkMs() + 1), delay)
      out.result().iterator
    }
  }

  /** The VIDEO door — [[dedupeRaster]]'s contract keyed by the m19
    * clip content signature ([[Multimodal.clipSigOf]]: md5 over the
    * k evenly-spaced sampled-frame checksums — the SAME digest the
    * batch gate assembles, one definition, no drift): a mirror
    * re-serving the same clip under different container byte noise
    * dedups at ingest. Completes the door symmetry across all four
    * modalities (t1↔dedupe, m8/m9↔raster/perceptual, m11↔audio,
    * m19↔this). Quarantine rule as everywhere: clips whose container
    * doesn't parse or with no decodable frame have no identity and
    * drop to the batch sweep's conventions. State: one md5 string per
    * distinct clip signature in the window. */
  def dedupeClips(media: DataFrame, tsCol: String, delay: String,
      k: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("content"), col(tsCol).as("__ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes, ts) =>
          Multimodal.clipSigOf(bytes, k).map(sig => (id, ts, sig))
        }
      }
      .toDF("media_id", tsCol, "clip_sig")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("clip_sig")
  }

  /** The AUDIO-MANIFEST DOOR (VERDICT r16 item 6): the stateless
    * one-decode projection of BOTH m26 keys — the exact PCM signature
    * (tier 1's dedup identity) and the m18 perceptual hash (tier 2's
    * cluster key) — via [[Multimodal.audioKeysOf]], the same
    * definition the batch gate scans with. Persisted at ingest, the
    * output IS the standing key table the publish-time finalize
    * ([[Multimodal.audioManifest]] — keeper election, band-hamming
    * clusters over keepers, verdict join) composes, completing the
    * manifest leg the other three door families already have
    * (StreamingAudioManifestSpec pins row-for-row parity with the
    * m26 batch gate). Quarantine rule as everywhere: bytes that
    * decode to no PCM — or clips shorter than the hash's 64 blocks,
    * which have an exact identity but no perceptual one — drop to
    * the batch sweep's conventions. */
  def audioManifestDoor(media: DataFrame, tsCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("content"), col(tsCol).as("__ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions(_.flatMap { case (id, bytes, ts) =>
        Multimodal.audioKeysOf(bytes).map { case (_, sig, h) =>
          (id, ts, sig, h)
        }
      })
      .toDF("media_id", tsCol, "sig", "ahash")
  }

  def dedupeAudio(media: DataFrame, tsCol: String,
      delay: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("content"), col(tsCol).as("__ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, ts) =>
          Multimodal.audioHashOf(bytes).map(h => (id, ts, h))
        }
      }
      .toDF("media_id", tsCol, "ahash")
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("ahash")
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) None
          else Multimodal.dHash64(img).map(h => (id, ts, h))
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

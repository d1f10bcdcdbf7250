package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data lake: image/audio/video as
  * opaque `binary` content plus a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample staged as
  * partition-parallel transforms.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape,
  * deterministic outputs — is real and tested. The IMAGE decode path is
  * real: the JDK's `javax.imageio` reads PNG/JPEG/GIF/BMP bytes to
  * actual pixel dimensions. The AUDIO decode path is real too: the
  * JDK's `javax.sound.sampled` parses WAV/AIFF/AU headers to sample
  * rate and frame count (→ duration). Only VIDEO codec calls remain
  * STUBBED (the JDK ships no video codec and this build has no media
  * libraries): the site is marked `STUB:` and produces a deterministic
  * fake derived from the bytes, so tests are stable and the codec swap
  * is mechanical.
  *
  * Scale notes: content rides in the row (parquet binary) — at lake
  * scale the column is typically a reference (uri, offset, nbytes) into
  * blob storage and `decodePartition` fetches; the partition-iterator
  * shape below is exactly `mapInPandas`/`mapPartitions` batch decode,
  * so executors amortize codec init per partition, not per row.
  * `repartition(n)` before decode sets decode parallelism independent
  * of upstream file layout. */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)
  final case class MediaRow(mediaId: Long, kind: String, content: Array[Byte],
      meta: MediaMeta)
  final case class Decoded(mediaId: Long, kind: String, nBytes: Int,
      meanByte: Double, checksum: Long, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)
  final case class Features(mediaId: Long, embedding: Array[Float])

  /** Deterministic fixture table: stable pseudo-random bytes per id. */
  def fixture(spark: SparkSession, n: Int, parts: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).repartition(parts).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id * 37 % 191).toInt
      val bytes = Array.tabulate(len)(i => ((id * 131 + i * 31) % 251).toByte)
      MediaRow(id, kind,
        bytes, MediaMeta(
          format = if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
          width = if (kind == "image") 640 else 0,
          height = if (kind == "image") 480 else 0,
          sampleRate = if (kind == "audio") 16000 else 0,
          durationMs = if (kind == "video") 1000 + id * 40 else 0))
    }
  }

  /** Decode pass: partition-parallel, codec init amortized per
    * partition. Images go through a REAL codec — the JDK's ImageIO
    * (PNG/JPEG/GIF/BMP readers ship with the JRE): width/height come
    * from actual decoded pixels. Audio goes through a REAL parser too —
    * `javax.sound.sampled.AudioSystem` reads WAV/AIFF/AU headers:
    * sampleRate comes from the declared format and durationMs from the
    * actual frame count (frames * 1000 / rate). Bytes the codec cannot
    * parse (and non-matching kinds) carry zeros and keep the
    * deterministic byte summary. Video remains STUB: the JDK has no
    * video codec — a real implementation would open the decoder at the
    * per-partition init point below. */
  def decode(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init: prime ImageIO's plugin registry once
      // (and disable the on-disk cache — executor temp dirs may not
      // exist); AudioSystem's provider registry primes on first use;
      // STUB: a video codec would open here too
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val sum = m.content.foldLeft(0L)((a, b) => a + (b & 0xff))
        val (w, h) =
          if (m.kind == "image") {
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(m.content))
              catch { case _: Exception => null }
            if (img != null) (img.getWidth, img.getHeight) else (0, 0)
          } else (0, 0)
        val (rate, durMs) =
          if (m.kind == "audio") {
            // ByteArrayInputStream supports mark/reset, which the
            // provider probe requires; header-only parse, no PCM decode
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(m.content))
              try {
                val f = ais.getFormat
                val frames = ais.getFrameLength
                val r = f.getSampleRate
                if (r > 0 && frames >= 0)
                  (r.toInt, (frames * 1000.0 / r).toLong)
                else (0, 0L)
              } finally ais.close()
            } catch { case _: Exception => (0, 0L) }
          } else (0, 0L)
        Decoded(m.mediaId, m.kind, m.content.length,
          sum.toDouble / m.content.length,
          m.content.foldLeft(1125899906842597L)((a, b) => 31 * a + (b & 0xff)),
          w, h, rate, durMs)
      }
    }
  }

  /** Feature extraction: binary → fixed-dim float embedding. STUB: a
    * real model forward pass; the fake projects byte histograms to
    * `dim` floats deterministically. Batch shape matches a model
    * server: one buffer per partition, vectorized inner loop. */
  def features(media: Dataset[MediaRow], dim: Int = 16): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val emb = Array.tabulate(dim) { d =>
          var acc = 0.0f
          var i = d
          while (i < m.content.length) {
            acc += ((m.content(i) & 0xff) - 125.5f) / 125.5f
            i += dim
          }
          acc
        }
        Features(m.mediaId, emb)
      }
    }
  }

  /** Image resize request: pure metadata transform (the byte transform
    * is the decode stub's job); keeps aspect ratio like a real
    * thumbnailer. No shuffle. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast("double"))
    media
      .where(col("kind") === "image")
      .withColumn("target_width", ceil(w * scale).cast("int"))
      .withColumn("target_height", ceil(h * scale).cast("int"))
  }

  /** Video frame sampling: k evenly spaced timestamps per clip from the
    * duration metadata — pure column arithmetic (sequence), one output
    * row per frame via explode; partition count is preserved. */
  def frameSample(media: DataFrame, k: Int): DataFrame =
    media
      .where(col("kind") === "video" && col("meta.durationMs") > 0)
      .select(col("mediaId"), col("meta.durationMs").as("duration_ms"),
        explode(sequence(lit(0), lit(k - 1))).as("frame_idx"))
      .withColumn("frame_ts_ms",
        (col("frame_idx") * col("duration_ms") / k).cast("long"))
}

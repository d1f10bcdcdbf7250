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
  * rate and frame count (→ duration). The VIDEO path parses the
  * ISO-BMFF/MP4 CONTAINER for real — a pure-JDK `ftyp`/`moov`/`mvhd`
  * box walk yields timescale, duration, and track count — and only the
  * PIXEL decode remains STUBBED (the JDK ships no video codec and this
  * build has no media libraries): that one site is marked `STUB:` so
  * the codec swap is mechanical.
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

  /** Container-level video metadata from the MP4 box walk. */
  final case class Mp4Meta(majorBrand: String, timescaleHz: Long,
      durationMs: Long, trackCount: Int)

  /** Pure-JDK ISO-BMFF/MP4 container walk (NO codec): top-level boxes →
    * `ftyp` major brand; `moov` children → `trak` count and `mvhd`
    * (v0: 32-bit timescale/duration at payload+12/+16; v1: 64-bit
    * duration at +20/+24) → duration in ms. Boxes are
    * [u32 size][4cc type][payload]; size==1 pulls a 64-bit largesize,
    * size==0 means to-end-of-enclosure. Returns None unless a
    * well-formed `moov`/`mvhd` with a positive timescale is present —
    * arbitrary bytes fail the very first size bound and fall out. */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Int): String = new String(bytes, off, 4, "ISO-8859-1")
    /** (type, payloadStart, payloadEnd) for each box in [start, end);
      * stops at the first malformed header. */
    def walk(start: Int, end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val size0 = u32(off)
        val (hdr, size) =
          if (size0 == 1 && off + 16 <= end) (16L, u64(off + 8))
          else if (size0 == 0) (8L, (end - off).toLong)
          else (8L, size0)
        if (size < hdr || size > end - off) ok = false
        else {
          out += ((fourcc(off + 4), off + hdr.toInt, off + size.toInt))
          off += size.toInt
        }
      }
      out.result()
    }
    val top = walk(0, bytes.length)
    val brand = top.collectFirst {
      case ("ftyp", s, e) if e - s >= 4 => fourcc(s)
    }
    top.collectFirst { case ("moov", s, e) => walk(s, e) }.flatMap { kids =>
      val tracks = kids.count(_._1 == "trak")
      kids.collectFirst { case ("mvhd", s, e) => (s, e) }.flatMap {
        case (s, e) =>
          val v = if (e - s >= 1) bytes(s) & 0xff else -1
          val tsDur =
            if (v == 0 && e - s >= 20) Some((u32(s + 12), u32(s + 16)))
            else if (v == 1 && e - s >= 32) Some((u32(s + 20), u64(s + 24)))
            else None
          tsDur.collect { case (ts, dur) if ts > 0 =>
            Mp4Meta(brand.getOrElse(""), ts, dur * 1000L / ts, tracks)
          }
      }
    }
  }

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
    * actual frame count (frames * 1000 / rate). Video durationMs comes
    * from the REAL container walk ([[parseMp4]] — mvhd duration over
    * timescale); only pixel access is stubbed. Bytes a parser cannot
    * read (and non-matching kinds) carry zeros and keep the
    * deterministic byte summary. */
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
          } else if (m.kind == "video")
            // container-level parse is real (ftyp/moov/mvhd box walk);
            // STUB: pixel decode would need a video codec the JDK lacks —
            // a real frame reader would open at the per-partition init
            (0, parseMp4(m.content).map(_.durationMs).getOrElse(0L))
          else (0, 0L)
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

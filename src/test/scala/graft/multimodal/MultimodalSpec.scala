package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fixture(spark, 30, parts = 4)

  test("fixture: deterministic binary + typed metadata, partitioned") {
    assert(media.rdd.getNumPartitions == 4)
    val a = media.collect().sortBy(_.mediaId)
    val b = Multimodal.fixture(spark, 30, parts = 4).collect().sortBy(_.mediaId)
    assert(a.map(_.content.toSeq) sameElements b.map(_.content.toSeq))
    assert(a.map(_.kind).distinct.toSet == Set("image", "audio", "video"))
  }

  test("decode: per-partition batch shape, deterministic summaries") {
    val d = Multimodal.decode(media).collect().map(x => x.mediaId -> x).toMap
    assert(d.size == 30)
    val m0 = media.filter(col("mediaId") === 0).collect().head
    assert(d(0).nBytes == m0.content.length)
    assert(d(0).meanByte ==
      m0.content.map(_ & 0xff).sum.toDouble / m0.content.length)
    // stable across runs
    val d2 = Multimodal.decode(media).collect().map(x => x.mediaId -> x.checksum).toMap
    assert(d.view.mapValues(_.checksum).toMap == d2)
  }

  test("decode: a real PNG yields pixel dimensions from the actual codec") {
    import spark.implicits._
    // encode a genuine 17x9 PNG in-memory; add a second row of
    // non-image bytes claiming to be an image
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 9).foreach(y => (0 until 17).foreach(x =>
      img.setRGB(x, y, (x * 31 + y * 7) << 8)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", buf.toByteArray,
        Multimodal.MediaMeta("png", 17, 9, 0, 0)),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("png", 0, 0, 0, 0)))
    val d = Multimodal.decode(rows.toDS()).collect().map(x => x.mediaId -> x).toMap
    assert(d(1L).width == 17 && d(1L).height == 9)
    assert(d(2L).width == 0 && d(2L).height == 0) // unparseable → no dims
  }

  test("decode: a real WAV yields sample rate and duration from actual frames") {
    import spark.implicits._
    // genuine 8 kHz mono 16-bit WAV with exactly 1200 frames (= 150
    // ms) via the shared encoder (ONE copy of the WAV-writing logic —
    // this same helper feeds the m4 driver gate); add a garbage-bytes
    // row claiming "audio"
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", Multimodal.wavFixture(1200),
        Multimodal.MediaMeta("wav", 0, 0, 8000, 150)),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 8, 7, 6, 5),
        Multimodal.MediaMeta("wav", 0, 0, 0, 0)))
    val d = Multimodal.decode(rows.toDS()).collect().map(x => x.mediaId -> x).toMap
    assert(d(1L).sampleRate == 8000)
    assert(d(1L).durationMs == 150) // 1200 frames * 1000 / 8000
    assert(d(2L).sampleRate == 0 && d(2L).durationMs == 0) // unparseable → zeros
  }

  test("decode: a genuine MP4 header yields duration from the mvhd box walk") {
    import spark.implicits._
    def box(t: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(payload.length + 8)
      b.putInt(payload.length + 8).put(t.getBytes("ISO-8859-1")).put(payload)
      b.array()
    }
    // mvhd v0: version+flags(4) creation(4) modification(4)
    // timescale(4) duration(4) rate(4) volume+reserved(12) matrix(36)
    // predefined(24) next_track_id(4) — full 100-byte payload
    def mvhdV0(timescale: Int, duration: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      b.array()
    }
    // mvhd v1: version+flags(4) creation(8) modification(8)
    // timescale(4) duration(8)
    def mvhdV1(timescale: Int, duration: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(112)
      b.putInt(0x01000000).putLong(0L).putLong(0L).putInt(timescale)
        .putLong(duration)
      b.array()
    }
    val ftyp = box("ftyp", "isom\u0000\u0000\u0002\u0000isomiso2".getBytes("ISO-8859-1"))
    // timescale 600 Hz, duration 1500 ticks → 2500 ms; two tracks
    val mp4v0 = ftyp ++ box("moov",
      box("mvhd", mvhdV0(600, 1500)) ++
        box("trak", Array.emptyByteArray) ++ box("trak", Array.emptyByteArray))
    // v1 64-bit: 90 kHz, 90000 ticks → 1000 ms; one track
    val mp4v1 = ftyp ++ box("moov",
      box("mvhd", mvhdV1(90000, 90000L)) ++ box("trak", Array.emptyByteArray))

    val p0 = Multimodal.parseMp4(mp4v0).get
    assert(p0.majorBrand == "isom" && p0.timescaleHz == 600)
    assert(p0.durationMs == 2500 && p0.trackCount == 2)
    val p1 = Multimodal.parseMp4(mp4v1).get
    assert(p1.durationMs == 1000 && p1.trackCount == 1)
    // arbitrary bytes fail the box-size bound → None, no throw
    assert(Multimodal.parseMp4(Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9)).isEmpty)

    // the distributed decode path picks the container duration up
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", mp4v0,
        Multimodal.MediaMeta("mp4", 0, 0, 0, 2500)),
      Multimodal.MediaRow(2L, "video", Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("mp4", 0, 0, 0, 0)))
    val d = Multimodal.decode(rows.toDS()).collect().map(x => x.mediaId -> x).toMap
    assert(d(1L).durationMs == 2500)
    assert(d(2L).durationMs == 0) // unparseable → zeros, not a throw
  }

  test("parseAvi: genuine RIFF/AVI header fields; garbage → None") {
    val avi = Multimodal.aviMjpegFixture(frames = 6, width = 48, height = 32,
      fps = 25)
    val m = Multimodal.parseAvi(avi).get
    assert(m.microSecPerFrame == 40000) // 1e6 / 25 fps
    assert(m.totalFrames == 6 && m.streams == 1)
    assert(m.width == 48 && m.height == 32)
    assert(Multimodal.aviFrameChunks(avi).length == 6)
    assert(Multimodal.parseAvi(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)).isEmpty)
    assert(Multimodal.aviFrameChunks("RIFFxxxxJUNK".getBytes).isEmpty)
  }

  test("frameSampleAvi: real JPEG pixel decode, checksum parity, sampling math") {
    import spark.implicits._
    val avi = Multimodal.aviMjpegFixture(frames = 10, width = 40, height = 24)
    val rows = Seq(
      Multimodal.MediaRow(1L, "video", avi,
        Multimodal.MediaMeta("avi", 0, 0, 0, 1000)),
      // an audio row and a garbage video row must both yield no frames
      Multimodal.MediaRow(2L, "audio", avi,
        Multimodal.MediaMeta("wav", 0, 0, 8000, 0)),
      Multimodal.MediaRow(3L, "video", Array[Byte](5, 4, 3, 2, 1),
        Multimodal.MediaMeta("avi", 0, 0, 0, 0)))
    val got = Multimodal.frameSampleAvi(rows.toDS(), k = 4).collect()
      .sortBy(_.frameIdx)
    assert(got.forall(_.mediaId == 1L))
    // i*n/k over n=10, k=4 → frames 0,2,5,7; ts at 10 fps (100 ms each)
    assert(got.map(_.frameNo).toSeq == Seq(0, 2, 5, 7))
    assert(got.map(_.frameTsMs).toSeq == Seq(0L, 200L, 500L, 700L))
    // dims come from the DECODED raster
    assert(got.forall(f => f.width == 40 && f.height == 24))
    // checksum parity vs a direct ImageIO decode of the same chunks —
    // JPEG is lossy so this is the only honest pixel reference
    val chunks = Multimodal.aviFrameChunks(avi)
    got.foreach { f =>
      val (cs, ce) = chunks(f.frameNo)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(avi, cs, ce - cs))
      var acc = 1125899906842597L
      (0 until img.getHeight).foreach(y => (0 until img.getWidth).foreach(x =>
        acc = 31 * acc + (img.getRGB(x, y) & 0xffffff)))
      assert(f.pixChecksum == acc, s"frame ${f.frameNo} checksum drift")
      assert(f.pixChecksum != 0L)
    }
    // frames differ (the per-frame gradient moves) → checksums differ
    assert(got.map(_.pixChecksum).distinct.length == got.length)
  }

  test("frameSampleAvi: k > frame count duplicates frames, stays total") {
    import spark.implicits._
    val avi = Multimodal.aviMjpegFixture(frames = 2, width = 16, height = 16)
    val rows = Seq(Multimodal.MediaRow(7L, "video", avi,
      Multimodal.MediaMeta("avi", 0, 0, 0, 200)))
    val got = Multimodal.frameSampleAvi(rows.toDS(), k = 5).collect()
      .sortBy(_.frameIdx)
    assert(got.length == 5)
    assert(got.map(_.frameNo).toSeq == Seq(0, 0, 0, 1, 1)) // i*2/5
  }

  test("featuresPixels: exact projection of a lossless raster; bad/non-image yield no rows") {
    import spark.implicits._
    val (k, w, h) = (9L, 17, 13)
    val rows = Seq(
      Multimodal.MediaRow(k, "image", Multimodal.pngFixture(k, w, h),
        Multimodal.MediaMeta("png", w, h, 0, 0)),
      // non-image kind and undecodable image bytes: no rows
      Multimodal.MediaRow(2L, "video", Multimodal.pngFixture(2L, 4, 4),
        Multimodal.MediaMeta("png", 4, 4, 0, 0)),
      Multimodal.MediaRow(3L, "image", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta("png", 0, 0, 0, 0)))
    val got = Multimodal.featuresPixels(rows.toDS(), dim = 3).collect()
    assert(got.forall(f => f.mediaId == k && f.frameIdx == -1))
    assert(got.length == 3)
    // algebraic reference straight from the gradient formulas
    val want = (0 until 3).map { d =>
      var acc = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val pv = (k * 53 + x * 3) % 256 + (k * 29 + y * 5) % 256 +
          (k * 17 + x + y) % 256
        val p = y.toLong * w + x
        acc += pv * (((d + 1L) * (p + 7L)) % 101L - 50L)
      }
      d -> acc
    }.toMap
    got.foreach(f => assert(f.v == want(f.d), s"dim ${f.d} drift"))
  }

  test("featuresFrames: sampled AVI frames project their DECODED rasters exactly") {
    import spark.implicits._
    val avi = Multimodal.aviMjpegFixture(frames = 6, width = 24, height = 16)
    val rows = Seq(Multimodal.MediaRow(5L, "video", avi,
      Multimodal.MediaMeta("avi", 0, 0, 0, 600)))
    val got = Multimodal.featuresFrames(rows.toDS(), k = 3, dim = 2).collect()
    assert(got.length == 6) // 3 frames × 2 dims
    assert(got.map(_.frameIdx).toSet == Set(0, 1, 2))
    // reference: direct ImageIO decode of the same chunks (JPEG is
    // lossy — the decoded raster is the only honest pixel truth)
    val chunks = Multimodal.aviFrameChunks(avi)
    got.foreach { f =>
      val (cs, ce) = chunks(f.frameIdx * chunks.length / 3)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(avi, cs, ce - cs))
      var acc = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val pv = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val p = y.toLong * img.getWidth + x
        acc += pv * (((f.d + 1L) * (p + 7L)) % 101L - 50L)
      }
      assert(f.v == acc, s"frame ${f.frameIdx} dim ${f.d} drift")
    }
    // moving gradient → per-frame features differ
    assert(got.filter(_.d == 0).map(_.v).distinct.length == 3)
  }

  test("rasterSignature: PNG and BMP of one raster hash equal; bytes differ; seeds differ") {
    import spark.implicits._
    val png = Multimodal.imageFixture(3L, 18, 16, "png")
    val bmp = Multimodal.imageFixture(3L, 18, 16, "bmp")
    assert(!java.util.Arrays.equals(png, bmp)) // containers differ...
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", png, Multimodal.MediaMeta("png", 18, 16, 0, 0)),
      Multimodal.MediaRow(2L, "image", bmp, Multimodal.MediaMeta("bmp", 18, 16, 0, 0)),
      Multimodal.MediaRow(3L, "image", Multimodal.imageFixture(4L, 18, 16),
        Multimodal.MediaMeta("png", 18, 16, 0, 0)),
      Multimodal.MediaRow(4L, "audio", png, Multimodal.MediaMeta("png", 0, 0, 0, 0)),
      Multimodal.MediaRow(5L, "image", Array[Byte](9, 9), Multimodal.MediaMeta("png", 0, 0, 0, 0)))
    val got = Multimodal.rasterSignature(rows.toDS()).collect()
      .map(r => r.mediaId -> r.sig).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // non-image/garbage: no rows
    assert(got(1L) == got(2L)) // ...but the DECODED raster is one content
    assert(got(1L) != got(3L)) // different gradient seed → different sig
  }

  test("dHash64: provably stable under the sum-preserving perturbation; families distinct") {
    def decode(b: Array[Byte]) = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b))
    val hashes = (0 until 17).map { s =>
      val base = Multimodal.dHash64(decode(
        Multimodal.noiseFixture(s.toLong, 18, 16))).get
      for (d <- 1 to 4) {
        val pert = Multimodal.dHash64(decode(
          Multimodal.perturbedImageFixture(s.toLong, d, 18, 16))).get
        assert(pert == base, s"seed $s delta $d flipped a dHash bit")
        // the perturbed raster genuinely differs from the base
        assert(!java.util.Arrays.equals(
          Multimodal.noiseFixture(s.toLong, 18, 16),
          Multimodal.perturbedImageFixture(s.toLong, d, 18, 16)))
      }
      base
    }
    assert(hashes.distinct.size == 17, "noise families must not collide")
    // below the 9x8 grid: no hash
    assert(Multimodal.dHash64(decode(
      Multimodal.imageFixture(0L, 8, 8))).isEmpty)
  }

  test("aHash64Pcm: stable under the sum-preserving perturbation; families distinct; short clips none") {
    import spark.implicits._
    def decodeHash(b: Array[Byte]): Long = {
      val rows = Seq(Multimodal.MediaRow(0L, "audio", b,
        Multimodal.MediaMeta("wav", 0, 0, 8000, 0)))
      Multimodal.audioHash(rows.toDS()).collect().head.ahash
    }
    val hashes = (0 until 17).map { s =>
      val base = decodeHash(Multimodal.wavNoiseFixture(s.toLong, 1280))
      for (d <- 1 to 4) {
        val pert = Multimodal.wavNoiseFixture(s.toLong, 1280, delta = d)
        assert(decodeHash(pert) == base, s"seed $s delta $d flipped a bit")
        assert(!java.util.Arrays.equals(pert,
          Multimodal.wavNoiseFixture(s.toLong, 1280)))
      }
      base
    }
    assert(hashes.distinct.size == 17, "PCM noise families must not collide")
    assert(Multimodal.aHash64Pcm(Array.fill(63)(5)).isEmpty)
  }

  test("seeded AVI frames: rasters distinct across (family, frame); identical within") {
    // m12's inverted-index soundness: a frame raster identifies
    // (seed, frame number) uniquely, and the same (seed, frame) is
    // byte-identical across clips of different length
    def checksums(seed: Long, frames: Int): Vector[Long] = {
      val avi = Multimodal.aviMjpegFixture(frames, 24, 16, 10, seed)
      Multimodal.aviFrameChunks(avi).map { case (cs, ce) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(avi, cs, ce - cs))
        var acc = 1125899906842597L
        (0 until img.getHeight).foreach(y =>
          (0 until img.getWidth).foreach(x =>
            acc = 31 * acc + (img.getRGB(x, y) & 0xffffff)))
        acc
      }
    }
    val all = for (s <- 0L until 10L; f <- checksums(s, 8)) yield f
    assert(all.distinct.size == 80, "every (family, frame) raster unique")
    // same (seed, frame) in a SHORTER clip decodes to the same raster
    assert(checksums(3L, 6) == checksums(3L, 8).take(6))
  }

  // the deterministic gradient both AVI fixtures paint — the algebraic
  // pixel truth the raw-frame tests pin against (no second decode path)
  private def gradientRgb(f: Long, seed: Long, x: Int, y: Int): Int =
    ((((f * 53 + seed * 101 + x * 3) % 256).toInt << 16) |
      (((f * 29 + seed * 59 + y * 5) % 256).toInt << 8) |
      ((f * 17 + seed * 23 + x + y) % 256).toInt)

  test("aviDibInfo: BI_RGB stream detected; MJPEG and garbage are not") {
    val dib = Multimodal.aviDibFixture(frames = 3, width = 23, height = 7)
    assert(Multimodal.aviDibInfo(dib)
      == Some(Multimodal.AviDibInfo(23, 7, topDown = false)))
    // an MJPEG stream must NOT take the raw path (its chunks are JPEG)
    val mjpg = Multimodal.aviMjpegFixture(frames = 2, width = 24, height = 16)
    assert(Multimodal.aviDibInfo(mjpg).isEmpty)
    assert(Multimodal.aviDibInfo(Array[Byte](1, 2, 3)).isEmpty)
    // the raw fixture is still a well-formed AVI to the container walk
    assert(Multimodal.parseAvi(dib).exists(_.totalFrames == 3))
    assert(Multimodal.aviFrameChunks(dib).length == 3)
  }

  test("frameSampleAvi: raw BI_RGB frames decode codec-free to the exact gradient") {
    import spark.implicits._
    // width 23 → 69 raster bytes/row, stride 72: exercises the 4-byte
    // row alignment; bottom-up storage must come back upright
    val avi = Multimodal.aviDibFixture(frames = 5, width = 23, height = 7,
      fps = 10, seed = 4L)
    val rows = Seq(Multimodal.MediaRow(9L, "video", avi,
      Multimodal.MediaMeta("avi", 23, 7, 0, 0)))
    val got = Multimodal.frameSampleAvi(rows.toDS(), k = 5).collect()
      .sortBy(_.frameIdx)
    assert(got.length == 5)
    assert(got.forall(f => f.width == 23 && f.height == 7))
    got.foreach { fr =>
      var acc = 1125899906842597L
      for (y <- 0 until 7; x <- 0 until 23)
        acc = 31 * acc + (gradientRgb(fr.frameNo, 4L, x, y) & 0xffffff)
      assert(fr.pixChecksum == acc,
        s"frame ${fr.frameNo}: decoded raster != gradient formula")
      assert(fr.frameTsMs == fr.frameNo * 100L)
    }
  }

  test("decodeDibFrame via featuresFrames: exact algebraic projection; truncated frame yields no rows") {
    import spark.implicits._
    val avi = Multimodal.aviDibFixture(frames = 4, width = 18, height = 16,
      fps = 10, seed = 11L)
    val rows = Seq(Multimodal.MediaRow(1L, "video", avi,
      Multimodal.MediaMeta("avi", 18, 16, 0, 0)))
    val got = Multimodal.featuresFrames(rows.toDS(), k = 2, dim = 3).collect()
    assert(got.length == 6) // 2 frames × 3 dims
    got.foreach { f =>
      val fno = f.frameIdx * 4 / 2
      var acc = 0L
      for (y <- 0 until 16; x <- 0 until 18) {
        val rgb = gradientRgb(fno, 11L, x, y)
        val pv = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val p = y.toLong * 18 + x
        acc += pv * (((f.d + 1L) * (p + 7L)) % 101L - 50L)
      }
      assert(f.v == acc, s"frame ${f.frameIdx} dim ${f.d} drift")
    }
    // a truncated raster chunk must not fabricate pixels: shrink the
    // LAST frame chunk's size field by one row — that chunk decodes to
    // nothing, the clip's other sampled frame survives
    val chunks = Multimodal.aviFrameChunks(avi)
    val (lastStart, _) = chunks.last
    val bad = avi.clone()
    val sizeOff = lastStart - 4
    val stride = ((18 * 3 + 3) / 4) * 4
    val newSize = stride * 16 - stride
    bad(sizeOff) = (newSize & 0xff).toByte
    bad(sizeOff + 1) = ((newSize >> 8) & 0xff).toByte
    bad(sizeOff + 2) = ((newSize >> 16) & 0xff).toByte
    bad(sizeOff + 3) = ((newSize >> 24) & 0xff).toByte
    val rows2 = Seq(Multimodal.MediaRow(2L, "video", bad,
      Multimodal.MediaMeta("avi", 18, 16, 0, 0)))
    val got2 = Multimodal.featuresFrames(rows2.toDS(), k = 4, dim = 1).collect()
    assert(got2.nonEmpty && got2.forall(_.frameIdx < 3),
      "truncated frame must yield no rows, earlier frames must survive")
  }

  test("decodeDibFrame: negative biHeight (top-down rows) flips the raster") {
    import spark.implicits._
    val h = 7
    val avi = Multimodal.aviDibFixture(frames = 1, width = 23, height = h,
      fps = 10, seed = 2L)
    // negate strf's biHeight in place: same chunks, now declared
    // top-down — the decoded image must be the vertical mirror
    val strfAt = (0 until avi.length - 4)
      .find(i => new String(avi, i, 4, "ISO-8859-1") == "strf").get
    val hOff = strfAt + 8 + 8 // past fourcc+size, biSize, biWidth
    val neg = -h
    val bad = avi.clone()
    bad(hOff) = (neg & 0xff).toByte
    bad(hOff + 1) = ((neg >> 8) & 0xff).toByte
    bad(hOff + 2) = ((neg >> 16) & 0xff).toByte
    bad(hOff + 3) = ((neg >> 24) & 0xff).toByte
    assert(Multimodal.aviDibInfo(bad)
      == Some(Multimodal.AviDibInfo(23, h, topDown = true)))
    val got = Multimodal.frameSampleAvi(
      Seq(Multimodal.MediaRow(3L, "video", bad,
        Multimodal.MediaMeta("avi", 23, h, 0, 0))).toDS(), k = 1).collect()
    var acc = 1125899906842597L
    for (y <- 0 until h; x <- 0 until 23)
      acc = 31 * acc + (gradientRgb(0, 2L, x, h - 1 - y) & 0xffffff)
    assert(got.head.pixChecksum == acc, "top-down rows must mirror")
  }

  test("raw AVI frames: rasters distinct across (family, frame); identical within (m14's pin)") {
    // m14's inverted-index soundness — the m12 pin, codec-free: a raw
    // frame raster identifies (seed, frame) uniquely, and the same
    // (seed, frame) is identical across clips of different length
    def checksums(seed: Long, frames: Int): Vector[Long] = {
      val avi = Multimodal.aviDibFixture(frames, 24, 16, 10, seed)
      val info = Multimodal.aviDibInfo(avi).get
      Multimodal.aviFrameChunks(avi).map { case (cs, ce) =>
        // expected == stored: recompute from the gradient (lossless)
        var acc = 1125899906842597L
        for (y <- 0 until info.height; x <- 0 until info.width) {
          val stride = ((info.width * 3 + 3) / 4) * 4
          val off = cs + (info.height - 1 - y) * stride + 3 * x
          val rgb = ((avi(off + 2) & 0xff) << 16) |
            ((avi(off + 1) & 0xff) << 8) | (avi(off) & 0xff)
          acc = 31 * acc + rgb
        }
        acc
      }
    }
    val all = for (s <- 0L until 10L; f <- checksums(s, 8)) yield f
    assert(all.distinct.size == 80, "every (family, frame) raster unique")
    assert(checksums(3L, 6) == checksums(3L, 8).take(6))
  }

  test("pcmSamples: RIFF fast path == AudioSystem decode byte for byte; contract still enforced") {
    val wav = Multimodal.wavNoiseFixture(5L, 1280, delta = 2)
    val viaFast = Multimodal.pcmSamples(wav)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bytes = try ais.readAllBytes() finally ais.close()
    val viaSys = Array.tabulate(bytes.length / 2)(j =>
      (bytes(2 * j) & 0xff) | (bytes(2 * j + 1).toInt << 8))
    assert(viaFast.length == 1280)
    assert(viaFast.toSeq == viaSys.toSeq)
    // a stereo WAV fails the mono contract on the fast path too
    val stereoFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val stereoAis = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](400)), stereoFmt, 100L)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stereoAis,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    assert(Multimodal.pcmSamples(buf.toByteArray).isEmpty)
    // garbage bytes: empty, no exception
    assert(Multimodal.pcmSamples(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("pcmSamples: fmt-matched WAV with oversized data size field falls to the general path (ADVICE r14)") {
    // streaming-written WAVs carry placeholder/oversized data sizes;
    // riffWalk rejects such a chunk, but AudioSystem still decodes the
    // available frames — the fast path must fall THROUGH, not return
    // an empty decode the general path would not have produced
    val wav = Multimodal.wavFixture(256)
    val idx = (0 until wav.length - 4)
      .find(i => new String(wav, i, 4, "ISO-8859-1") == "data").get
    val bad = wav.clone()
    val orig = (bad(idx + 4) & 0xff) | ((bad(idx + 5) & 0xff) << 8) |
      ((bad(idx + 6) & 0xff) << 16) | ((bad(idx + 7) & 0xff) << 24)
    val ns = orig + 100 // overflows the file → riffWalk drops the chunk
    bad(idx + 4) = (ns & 0xff).toByte
    bad(idx + 5) = ((ns >> 8) & 0xff).toByte
    bad(idx + 6) = ((ns >> 16) & 0xff).toByte
    bad(idx + 7) = ((ns >> 24) & 0xff).toByte
    val got = Multimodal.pcmSamples(bad)
    // the general path decodes every AVAILABLE frame — identical to the
    // well-formed fixture's samples (only the size FIELD was corrupted)
    assert(got.nonEmpty)
    assert(got.toSeq == Multimodal.pcmSamples(wav).toSeq)
  }

  test("features: fixed-dim embeddings, deterministic") {
    val f = Multimodal.features(media, dim = 16).collect()
    assert(f.length == 30)
    assert(f.forall(_.embedding.length == 16))
    val f2 = Multimodal.features(media, dim = 16).collect()
      .map(x => x.mediaId -> x.embedding.toSeq).toMap
    f.foreach(x => assert(f2(x.mediaId) == x.embedding.toSeq))
  }

  test("resizePlan: aspect-preserving bounds, images only, no upscale") {
    val r = Multimodal.resizePlan(media.toDF(), maxSide = 320).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (w, h) = (row.getAs[Int]("target_width"), row.getAs[Int]("target_height"))
      assert(w <= 320 && h <= 320 && w > 0 && h > 0)
    }
    // no upscale beyond original
    val small = Multimodal.resizePlan(media.toDF(), maxSide = 10000).collect()
    small.foreach { row =>
      assert(row.getAs[Int]("target_width") == 640)
      assert(row.getAs[Int]("target_height") == 480)
    }
  }

  test("frameSample: k evenly spaced frames within duration") {
    val fs = Multimodal.frameSample(media.toDF(), k = 4)
    val byId = fs.collect().groupBy(_.getAs[Long]("mediaId"))
    assert(byId.nonEmpty)
    byId.foreach { case (_, rows) =>
      assert(rows.length == 4)
      val ts = rows.sortBy(_.getAs[Int]("frame_idx")).map(_.getAs[Long]("frame_ts_ms"))
      val dur = rows.head.getAs[Long]("duration_ms")
      assert(ts.head == 0 && ts.forall(_ < dur))
      assert(ts.sameElements(ts.sorted))
    }
  }

  test("featuresPcm: exact projection of real decoded samples; bad/non-audio yield no rows") {
    import spark.implicits._
    val frames = 100
    val wav = Multimodal.wavFixture(frames)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav,
        Multimodal.MediaMeta("wav", 0, 0, 8000, 0)),
      // undecodable bytes: no rows (the frameSampleAvi convention)
      Multimodal.MediaRow(2L, "audio", Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("wav", 0, 0, 0, 0)),
      // non-audio kind: filtered before any decode attempt
      Multimodal.MediaRow(3L, "image", wav,
        Multimodal.MediaMeta("png", 0, 0, 0, 0)))
    val got = Multimodal.featuresPcm(rows.toDS(), dim = 3).collect()
      .map(f => (f.mediaId, f.d) -> f.v).toMap
    assert(got.keySet === (0 until 3).map((1L, _)).toSet)
    // recompute from the fixture's sample generator: pcm byte i is
    // (i*13 % 251) signed; sample j = lo | (hi << 8) sign-extended
    def sample(j: Int): Int = {
      val lo = (2 * j * 13) % 251
      val hi0 = ((2 * j + 1) * 13) % 251
      val hi = if (hi0 >= 128) hi0 - 256 else hi0
      lo + 256 * hi
    }
    (0 until 3).foreach { d =>
      val want = (0 until frames).map(j =>
        sample(j).toLong * (((d + 1L) * (j + 7L)) % 101L - 50L)).sum
      assert(got((1L, d)) === want, s"dim $d")
    }
  }

  test("bitPatternImage realizes any target dHash exactly, PNG round-trips") {
    val patterns = Seq(0L, -1L, 0xdeadbeefcafebabeL, 0x5555555555555555L,
      0x8000000000000001L, 1L << 63, 0x0f0f0f0f0f0f0f0fL)
    patterns.foreach { bits =>
      assert(Multimodal.dHash64(Multimodal.bitPatternImage(bits))
        === Some(bits), f"direct render of $bits%016x")
      // through the PNG codec (lossless): encode → ImageIO decode → hash
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.bitPatternFixture(bits)))
      assert(Multimodal.dHash64(img) === Some(bits),
        f"PNG round-trip of $bits%016x")
    }
    // non-default cell size keeps block boundaries on cell edges too
    assert(Multimodal.dHash64(
      Multimodal.bitPatternImage(0x123456789abcdef0L, cell = 3))
      === Some(0x123456789abcdef0L))
  }

  test("dHashClusters: band candidates + popcount edges + CC transitivity") {
    import spark.implicits._
    // chain A {0,1,3,7}: 1-bit steps; 0↔7 is distance 3 — NOT an edge
    // at maxDist=2, so its shared cluster can only come from CC
    // transitivity. chain B {0x3f, 0x7f}: distance ≥ 3 from every
    // A-member (min |{3,4,5}| = 3). Far singleton: high-band pattern.
    val hashes = Seq(
      10L -> 0L, 11L -> 1L, 12L -> 3L, 13L -> 7L,
      20L -> 0x3fL, 21L -> 0x7fL,
      30L -> (0xfL << 40))
    val got = Multimodal.dHashClusters(
      hashes.toDF("mediaId", "dhash"), maxDist = 2, bands = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
    // negative hashes (top bit set) band correctly via unsigned shift
    val neg = Multimodal.dHashClusters(
      Seq(1L -> -1L, 2L -> -2L, 3L -> Long.MinValue)
        .toDF("mediaId", "dhash"), maxDist = 2, bands = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -1 vs -2 differ in bit 0 only; MinValue vs -1 differ in 63 bits
    assert(neg === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // the band screen is only exact below the band count
    intercept[IllegalArgumentException] {
      Multimodal.dHashClusters(hashes.toDF("mediaId", "dhash"),
        maxDist = 4, bands = 4)
    }
  }

  test("wavPatternFixture realizes any target aHash exactly through the WAV codec") {
    val patterns = Seq(0L, 1L, 0xdeadbeefcafebabeL, 0x5555555555555555L,
      1L << 63, 0x7fffffffffffffffL)
    patterns.foreach { bits =>
      assert(Multimodal.audioHashOf(Multimodal.wavPatternFixture(bits))
        === Some(bits), f"WAV round-trip of $bits%016x")
    }
    // all-ones is unrealizable (no block exceeds its own global mean)
    // and must be rejected, not silently rendered as hash 0
    intercept[IllegalArgumentException] {
      Multimodal.wavPatternFixture(-1L)
    }
  }

  test("dHashProbe: asymmetric — only delta×corpus hits, never within a side") {
    import spark.implicits._
    // each delta is within distance 2 of corpus 10 and 11 but far from
    // 12 and 13; deltas 1 and 2 are distance 1 apart — a within-delta
    // pair the probe must NOT emit — and corpus 10/11 are distance 1
    // apart — a within-corpus pair ditto
    val delta = Seq(1L -> 0x7L, 2L -> 0x6L).toDF("mediaId", "dhash")
    val corpus = Seq(10L -> 0x5L, 11L -> 0x4L, 12L -> 0x38L,
      13L -> (0xfL << 30)).toDF("mediaId", "dhash")
    val got = Multimodal.dHashProbe(delta, corpus, maxDist = 2, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))
  }
}

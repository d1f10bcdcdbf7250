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
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // encode a genuine 8 kHz mono 16-bit WAV with exactly 1200 frames
    // (= 150 ms) in-memory; add a garbage-bytes row claiming "audio"
    val frames = 1200
    val pcm = Array.tabulate(frames * 2)(i => (i * 13 % 251).toByte)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", buf.toByteArray,
        Multimodal.MediaMeta("wav", 0, 0, 8000, 150)),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 8, 7, 6, 5),
        Multimodal.MediaMeta("wav", 0, 0, 0, 0)))
    val d = Multimodal.decode(rows.toDS()).collect().map(x => x.mediaId -> x).toMap
    assert(d(1L).sampleRate == 8000)
    assert(d(1L).durationMs == 150) // 1200 frames * 1000 / 8000
    assert(d(2L).sampleRate == 0 && d(2L).durationMs == 0) // unparseable → zeros
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
}

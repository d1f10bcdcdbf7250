package graft.tools

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.spark.Sessions

/** Throughput measurement for the media tier: synthesize N images
  * (seeded-noise PNGs, the m9 fixture) and N audio clips (seeded-noise
  * WAVs, the m11 fixture) PER-PARTITION on executors — fixture
  * synthesis is part of the measured work, exactly like a real scan's
  * decompression — then run each decode-bound operator end to end and
  * report rows/s. The media gates are fixture-bounded (a few hundred
  * rows — they pin semantics); this is where the CAPACITY number
  * comes from: every operator here is partition-local + one narrow
  * hash shuffle, so cluster throughput is executors × this rate.
  *
  * Usage: runMain graft.tools.MediaBench [nImages] [nAudio]
  */
object MediaBench {
  def main(args: Array[String]): Unit = {
    val nImg = args.headOption.map(_.toInt).getOrElse(500000)
    val nAud = if (args.length > 1) args(1).toInt else 100000
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    def timed[A](label: String, n: Long)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[media-bench] $label%-18s n=$n%8d wall=$s%7.2fs " +
        f"rate=${n / s}%9.0f rows/s")
      a
    }

    // localCheckpoint is EAGER — it must sit INSIDE the timed block or
    // the synthesis job runs untimed and the count scans cached blocks
    val images = timed("png_synthesis", nImg) {
      spark.range(nImg).repartition(256).map { id =>
        Multimodal.MediaRow(id, "image",
          Multimodal.perturbedImageFixture(id % 4096,
            delta = 1 + (id % 4).toInt, 18, 16),
          Multimodal.MediaMeta("png", 18, 16, 0, 0))
      }.localCheckpoint() // operators below are then measured pure
    }

    timed("raster_signature", nImg) {
      Multimodal.rasterSignature(images)
        .groupBy("sig").count().count()
    }
    timed("dhash_groups", nImg) {
      Multimodal.dHash(images).groupBy("dhash").count().count()
    }
    timed("pixel_features", nImg) {
      Multimodal.featuresPixels(images, dim = 4)
        .agg(sum("v")).collect()
    }

    val audio = timed("wav_synthesis", nAud) {
      spark.range(nAud).repartition(128).map { id =>
        Multimodal.MediaRow(id, "audio",
          Multimodal.wavNoiseFixture(id % 4096, frames = 1280,
            delta = 1 + (id % 4).toInt),
          Multimodal.MediaMeta("wav", 0, 0, 8000, 0))
      }.localCheckpoint()
    }

    timed("audio_hash_groups", nAud) {
      Multimodal.audioHash(audio).groupBy("ahash").count().count()
    }
    timed("pcm_features", nAud) {
      Multimodal.featuresPcm(audio, dim = 4).agg(sum("v")).collect()
    }
    spark.stop()
  }
}

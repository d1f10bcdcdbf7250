package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.multimodal.Multimodal

class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("streaming raster dedup: one survivor per decoded raster across formats and batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaStream.dedupeRaster(
      input.toDF().toDF("media_id", "content", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("media_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      // 40 arrivals over 10 rasters, PNG/BMP mixed, across two
      // micro-batches (cross-batch dups must be caught from STATE);
      // one undecodable blob must vanish, not fabricate an identity
      def rows(ks: Seq[Long]) = ks.map { k =>
        val fmt = if (k % 2 == 0) "png" else "bmp"
        (k, Multimodal.imageFixture(k % 10, 18, 16, fmt), t(k))
      }
      val (a, b) = rows(0L until 40L).splitAt(20)
      input.addData(a :+ ((99L, Array[Byte](1, 2, 3), t(50))): _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val kept = spark.table("media_dedup")
        .select("media_id").as[Long].collect().toSet
      // ONE survivor per raster group, drawn from that group — the
      // within-micro-batch winner is whichever row the state-store
      // task sees first (no ordering contract), so the spec pins the
      // dedup invariant, not an arrival-order accident
      assert(kept.size == 10)
      assert((0L until 10L).forall(g =>
        kept.count(id => id % 10 == g) == 1))
      // cross-batch dups were caught from state: batch two (ids 20-39)
      // contributed nothing new
      assert(kept.forall(_ < 20L))
    } finally q.stop()
  }

  test("streaming perceptual dedup: survivor set == batch m9 keeper set over the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaStream.dedupePerceptual(
      input.toDF().toDF("media_id", "content", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("media_pdedup")
      .outputMode(OutputMode.Append).start()
    try {
      // the m9 fixture family: 60 arrivals over 12 dHash families,
      // every row byte-distinct (sum-preserving perturbation whose
      // magnitude cycles), half PNG half BMP — raster-exact identity
      // sees 60 singletons, the perceptual key must see 12 groups.
      // Cross-batch dups must be caught from STATE; an undecodable
      // blob and a too-small image (no perceptual identity) vanish.
      def row(k: Long) = {
        val fmt = if (k % 2 == 0) "png" else "bmp"
        (k, Multimodal.perturbedImageFixture(k % 12,
          delta = 1 + ((k / 12) % 4).toInt, 18, 16, fmt), t(k))
      }
      val (a, b) = (0L until 60L).map(row).splitAt(30)
      input.addData(a ++ Seq(
        (98L, Array[Byte](9, 9, 9), t(70)),
        (99L, Multimodal.imageFixture(1L, 4, 4), t(71))): _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val kept = spark.table("media_pdedup")
        .select("media_id").as[Long].collect().toSet
      assert(kept.size == 12)
      assert((0L until 12L).forall(g => kept.count(_ % 12 == g) == 1))
      assert(!kept.contains(98L) && !kept.contains(99L))
      assert(kept.forall(_ < 30L), "batch two must contribute nothing new")
      // BATCH PARITY: the streamed survivors group exactly like the
      // batch m9 machinery (same dHash64 definition) over the same
      // prefix — one survivor per batch dup_group, keys equal
      import org.apache.spark.sql.functions.col
      val batchRows = (0L until 60L).map { k =>
        val (id, bytes, _) = row(k)
        graft.multimodal.Multimodal.MediaRow(id, "image", bytes,
          graft.multimodal.Multimodal.MediaMeta("png", 18, 16, 0, 0))
      }
      val batchHash = Multimodal.dHash(spark.createDataset(batchRows))
        .collect().map(h => h.mediaId -> h.dhash).toMap
      assert(batchHash.values.toSet.size == 12)
      val streamedHash = spark.table("media_pdedup")
        .select("media_id", "dhash").as[(Long, Long)].collect().toMap
      // every survivor carries the hash the batch side computes for it,
      // and survivors cover every batch group exactly once
      assert(streamedHash.forall { case (id, h) => batchHash(id) == h })
      assert(streamedHash.values.toSet == batchHash.values.toSet)
    } finally q.stop()
  }

  test("streaming audio dedup: survivor set == batch m11 grouping over the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaStream.dedupeAudio(
      input.toDF().toDF("media_id", "content", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("media_adedup")
      .outputMode(OutputMode.Append).start()
    try {
      // the m11 fixture family: 40 byte-distinct clips over 8 PCM
      // noise families (sum-preserving perturbation magnitude cycles);
      // an undecodable blob and a sub-64-sample clip must vanish
      def row(k: Long) =
        (k, Multimodal.wavNoiseFixture(k % 8, frames = 1280,
          delta = 1 + ((k / 8) % 4).toInt), t(k))
      val (a, b) = (0L until 40L).map(row).splitAt(20)
      input.addData(a ++ Seq(
        (98L, Array[Byte](7, 7, 7), t(70)),
        (99L, Multimodal.wavFixture(32), t(71))): _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val kept = spark.table("media_adedup")
        .select("media_id").as[Long].collect().toSet
      assert(kept.size == 8)
      assert((0L until 8L).forall(g => kept.count(_ % 8 == g) == 1))
      assert(!kept.contains(98L) && !kept.contains(99L))
      assert(kept.forall(_ < 20L), "batch two must contribute nothing new")
      // batch parity: same hash definition → same grouping
      val batchRows = (0L until 40L).map { k =>
        val (id, bytes, _) = row(k)
        graft.multimodal.Multimodal.MediaRow(id, "audio", bytes,
          graft.multimodal.Multimodal.MediaMeta("wav", 0, 0, 8000, 0))
      }
      val batchHash = Multimodal.audioHash(spark.createDataset(batchRows))
        .collect().map(h => h.mediaId -> h.ahash).toMap
      assert(batchHash.values.toSet.size == 8)
      import org.apache.spark.sql.functions.col
      val streamedHash = spark.table("media_adedup")
        .select("media_id", "ahash").as[(Long, Long)].collect().toMap
      assert(streamedHash.forall { case (id, h) => batchHash(id) == h })
      assert(streamedHash.values.toSet == batchHash.values.toSet)
    } finally q.stop()
  }

  test("streaming clip dedup: survivor set == batch m19 grouping over the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaStream.dedupeClips(
      input.toDF().toDF("media_id", "content", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("media_cdedup")
      .outputMode(OutputMode.Append).start()
    try {
      // the m19 fixture universe: 100 MJPEG clips in 30 (family,
      // length) content groups, split across two micro-batches by
      // parity (cross-batch dups must come from state); an
      // undecodable blob has no clip identity and vanishes
      def row(k: Long) = (k, Multimodal.aviMjpegFixture(
        frames = (6 + (k / 10) % 3).toInt, width = 24, height = 16,
        fps = 10, seed = k % 10), t(k))
      val all = (0L until 100L).map(row)
      val (a, b) = all.partition(_._1 % 2 == 0)
      input.addData(a :+ ((999L, Array[Byte](1, 2, 3), t(90))): _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val kept = spark.table("media_cdedup")
        .select("media_id").as[Long].collect().toSet
      // one survivor per (fam, n) group, drawn from that group
      assert(kept.size == 30)
      def group(k: Long) = (k % 10, (k / 10) % 3)
      assert(kept.map(group).size == 30)
      assert(!kept.contains(999L))
      // BATCH PARITY: the streamed survivors' signatures group exactly
      // like the m19 digest over the same clips — same frame sampling,
      // same checksum, same md5 assembly
      val batchRows = all.map { case (id, bytes, _) =>
        Multimodal.MediaRow(id, "video", bytes,
          Multimodal.MediaMeta("avi", 24, 16, 0, 0))
      }
      import org.apache.spark.sql.functions.{col, md5, concat_ws, transform,
        sort_array, collect_list, struct}
      val batchSigs = Multimodal.frameSampleAvi(
        spark.createDataset(batchRows), k = 4).toDF()
        .filter(col("width") > 0)
        .groupBy(col("mediaId"))
        .agg(md5(concat_ws(",",
          transform(sort_array(collect_list(
            struct(col("frameIdx"), col("pixChecksum")))),
            x => x.getField("pixChecksum")))).as("sig"))
        .as[(Long, String)].collect().toMap
      val streamedSigs = spark.table("media_cdedup")
        .select("media_id", "clip_sig").as[(Long, String)].collect().toMap
      assert(streamedSigs.forall { case (id, s) => batchSigs(id) == s })
      assert(batchSigs.values.toSet.size == 30)
    } finally q.stop()
  }

  test("streaming hamming candidates: pair set == batch dHashEdges over the same prefix") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaStream.nearDupCandidates(
      input.toDF().toDF("media_id", "content", "ts"), "ts", "1 hour",
      maxDist = 2, bands = 4)
      .writeStream.format("memory").queryName("media_hcand")
      .outputMode(OutputMode.Append).start()
    try {
      // the m16 chain universe (13 families × 6 variants) split across
      // two micro-batches by PARITY, so most qualifying pairs span the
      // batch boundary and must come from STATE, not within-batch
      // joins; an undecodable blob must vanish
      def row(k: Long) = (k, Multimodal.bitPatternFixture(
        graft.queries.MultimodalQueries.m16Bits(k)), t(k))
      val all = (0L until 78L).map(row)
      val (a, b) = all.partition(_._1 % 2 == 0)
      input.addData(a :+ ((99L, Array[Byte](1, 2, 3), t(90))): _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      // streamed pairs (distinct — a pair sharing several bands emits
      // once per shared band by contract)
      val streamed = spark.table("media_hcand")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      // batch truth: dHashEdges over the same 78 images
      import org.apache.spark.sql.functions.col
      val batchRows = all.map { case (id, bytes, _) =>
        Multimodal.MediaRow(id, "image", bytes,
          Multimodal.MediaMeta("png", 36, 32, 0, 0))
      }
      val batchPairs = Multimodal.dHashEdges(
        Multimodal.dHash(spark.createDataset(batchRows)).toDF(),
        maxDist = 2, bands = 4)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      // 6 qualifying pairs per family by the chain geometry
      assert(batchPairs.size == 13 * 6)
      assert(streamed == batchPairs)
      // every emitted distance is within the cut and exact
      val dists = spark.table("media_hcand")
        .select("d1", "d2", "dist").as[(Long, Long, Int)].collect()
      assert(dists.forall(_._3 <= 2))
    } finally q.stop()
  }

  test("streaming audio hamming candidates: pair set == batch edges over the aHash space") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = MediaStream.nearDupCandidatesAudio(
      input.toDF().toDF("media_id", "content", "ts"), "ts", "1 hour",
      maxDist = 2, bands = 4)
      .writeStream.format("memory").queryName("media_ahcand")
      .outputMode(OutputMode.Append).start()
    try {
      // the SAME chain universe as the image test, realized in the
      // audio hash space (wavPatternFixture) — the hash-agnostic core
      // must produce the identical pair structure; parity split across
      // micro-batches again forces cross-batch pairs through state
      def row(k: Long) = (k, Multimodal.wavPatternFixture(
        graft.queries.MultimodalQueries.m16Bits(k)), t(k))
      val all = (0L until 78L).map(row)
      val (a, b) = all.partition(_._1 % 2 == 0)
      input.addData(a :+ ((99L, Array[Byte](1, 2, 3), t(90))): _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val streamed = spark.table("media_ahcand")
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      val batchRows = all.map { case (id, bytes, _) =>
        Multimodal.MediaRow(id, "audio", bytes,
          Multimodal.MediaMeta("wav", 0, 0, 8000, 0))
      }
      val batchPairs = Multimodal.dHashEdges(
        Multimodal.audioHash(spark.createDataset(batchRows)).toDF()
          .select(org.apache.spark.sql.functions.col("mediaId"),
            org.apache.spark.sql.functions.col("ahash").as("dhash")),
        maxDist = 2, bands = 4)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(batchPairs.size == 13 * 6)
      assert(streamed == batchPairs)
    } finally q.stop()
  }
}

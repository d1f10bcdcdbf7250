package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.queries.MultimodalQueries

/** The m26 audio curation manifest produced by an AvailableNow
  * STREAMING run — the StreamingScorecardE2ESpec pattern applied to
  * the last uncovered media composition (VERDICT r16 item 6): the
  * door leg persists [[MediaStream.audioManifestDoor]]'s one-decode
  * (media_id, sig, ahash) key projection as clips arrive, and the
  * publish-time finalize runs [[Multimodal.audioManifest]] — the
  * BATCH gate's own composition (keeper election per PCM signature,
  * band-hamming clusters over keepers, verdict join) — over the
  * accumulated table. Parity with `m26_audio_manifest` is exact BY
  * CONSTRUCTION (one key definition, one composition definition);
  * this spec pins it row for row over m26's own fixture corpus. */
class StreamingAudioManifestSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private val tmpDirs = scala.collection.mutable.Buffer.empty[String]

  override def afterAll(): Unit = {
    tmpDirs.foreach { dir =>
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val walk = java.nio.file.Files.walk(root)
        try walk.iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
    super.afterAll()
  }

  test("AvailableNow door keys finalize to the batch m26 manifest") {
    // m26's fixture universe, arriving as a stream: the 78-pattern
    // chain WAVs, each ingested twice (k and k+78 byte-identical)
    val batch = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long").as("k"))
      .filter(col("k") < 156).as[Long]
      .map { k =>
        (k, Multimodal.wavPatternFixture(MultimodalQueries.m16Bits(k % 78)))
      }
      .toDF("media_id", "content")
      .withColumn("ts",
        timestamp_seconds(lit(1700000000L) + col("media_id") % 100))
      .localCheckpoint()
    val srcDir = java.nio.file.Files.createTempDirectory("am_src").toString
    tmpDirs += srcDir
    batch.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)

    val leg = MediaStream.audioManifestDoor(stream, "ts")
      .writeStream.format("memory").queryName("am_keys")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    leg.awaitTermination()

    // publish-time finalize: the batch composition over the
    // accumulated door state (checkpointed first — what a real
    // publish pass reads, and the cluster self-join needs a
    // MultiInstanceRelation, the scorecard-spec convention)
    val got = Multimodal.audioManifest(
      spark.table("am_keys").localCheckpoint())

    val want = MultimodalQueries.m26AudioManifest.run(spark, sf)
    val cols = Seq("media_id", "exact_keeper", "cluster_id", "verdict")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.map(col): _*)
      .collect()
      .map(r => cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("∅")).mkString("|"))
      .sorted.toSeq
    val gotRows = rows(got)
    // parity must not be vacuous: the fixture universe (customer keys
    // < 156 — 150 rows at sf0.001) must exercise all three verdicts
    assert(gotRows.size >= 100)
    assert(Seq("exact_dup", "near_dup", "representative").forall(v =>
      gotRows.exists(_.endsWith(v))))
    assert(gotRows === rows(want))
  }
}

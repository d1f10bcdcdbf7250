package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.functions.TextAnalysis.tokens
import graft.queries.WordPieceQueries

class TokenizerStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed WordPiece fertility == batch per-source rollup over the same prefix") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 150)
    val pieces = WordPieceQueries.trainedPieces(spark, sf)
    assert(pieces.nonEmpty)
    // batch ground truth through the SAME fold over the same rows
    val expected = docs
      .select(col("source"),
        explode(filter(tokens(col("text")), w => w =!= "")).as("word"))
      .select(col("source"),
        WordPieceQueries.greedyUnits(col("word"), pieces).as("units"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum("units").as("n_units"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(expected.values.exists { case (t, u) => u > t }) // non-vacuous

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "source", "text", "ts")
    val q = TokenizerStream.fertilityWordpiece(stream, pieces)
      .writeStream.format("memory").queryName("wp_fert")
      .outputMode(OutputMode.Complete).start()
    try {
      val rows = docs
        .select(col("doc_id"), col("source"), col("text"),
          timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
        .as[(Long, String, String, Timestamp)].collect().toSeq
      val (a, b) = rows.splitAt(rows.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val got = spark.table("wp_fert")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("streamed Viterbi fertility == batch per-source rollup over the same prefix") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 150)
    val (costs, fb) = WordPieceQueries.viterbiModel(spark, sf)
    assert(costs.nonEmpty && fb > 0)
    val expected = docs
      .select(col("source"),
        explode(filter(tokens(col("text")), w => w =!= "")).as("word"))
      .select(col("source"),
        WordPieceQueries.viterbiCostUnits(col("word"), costs, fb)
          .getField("units").as("units"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum("units").as("n_units"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(expected.values.exists { case (t, u) => u > t }) // non-vacuous

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "source", "text", "ts")
    val q = TokenizerStream.fertilityViterbi(stream, costs, fb)
      .writeStream.format("memory").queryName("vit_fert")
      .outputMode(OutputMode.Complete).start()
    try {
      val rows = docs
        .select(col("doc_id"), col("source"), col("text"),
          timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
        .as[(Long, String, String, Timestamp)].collect().toSeq
      val (a, b) = rows.splitAt(rows.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val got = spark.table("vit_fert")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected)
    } finally q.stop()
  }
}

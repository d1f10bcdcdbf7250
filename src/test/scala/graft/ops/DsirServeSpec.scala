package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.queries.CurationQueries

class DsirServeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("frozen-model serve scores == the t71 gate's logw_bits, doc for doc") {
    val m = DsirServe.train(docs, col("lang") === "en")
    val served = DsirServe.score(docs, m)
      .select("doc_id", "logw_bits").as[(Long, Long)].collect().toMap
    val gate = CurationQueries.t71DsirWeights.run(spark, sf)
      .select("doc_id", "logw_bits").as[(Long, Long)].collect().toMap
    assert(served.size == gate.size)
    assert(served == gate)
  }

  test("serve plan is a pure projection: no joins, no aggregation exchange") {
    val m = DsirServe.train(docs, col("lang") === "en")
    val p = DsirServe.score(docs, m).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("the same projection serves a STREAM statelessly") {
    val m = DsirServe.train(docs, col("lang") === "en")
    val expected = DsirServe.score(docs.filter(col("doc_id") < 40), m)
      .select("doc_id", "logw_bits").as[(Long, Long)].collect().toMap

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")
    val q = DsirServe.score(stream, m)
      .select("doc_id", "logw_bits")
      .writeStream.format("memory").queryName("dsir_serve")
      .outputMode(OutputMode.Append).start()
    try {
      val rows = docs.filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text"),
          timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
        .as[(Long, String, Timestamp)].collect().toSeq
      val (a, b) = rows.splitAt(rows.size / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val got = spark.table("dsir_serve")
        .as[(Long, Long)].collect().toMap
      assert(got == expected)
    } finally q.stop()
  }
}

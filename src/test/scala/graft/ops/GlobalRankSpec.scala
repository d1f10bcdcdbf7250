package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("equals the single-partition window rank on a total key") {
    val df = spark.range(0, 10000).select(
      (col("id") * 2654435761L % 10007).as("k"), col("id"))
    val viaOp = GlobalRank
      .withGlobalRowNumber(df.toDF(), "rn", col("k"), col("id"))
      .select(col("k"), col("id"), col("rn"))
    val viaWindow = df
      .withColumn("rn", row_number().over(Window.orderBy("k", "id")).cast("long"))
    assert(viaOp.except(viaWindow).isEmpty && viaWindow.except(viaOp).isEmpty)
  }

  test("offset arithmetic is exact across many partitions") {
    val df = spark.range(0, 50000).repartition(16).toDF()
    // pin 8 range partitions: at demo scale AQE would coalesce to one,
    // which would vacuously pass a cross-partition offsets check
    val ranked = GlobalRank.withGlobalRowNumber(df, "rn", Some(8), Seq(col("id")))
    assert(ranked.rdd.getNumPartitions > 1)
    val stats = ranked.agg(
      min("rn").as("lo"), max("rn").as("hi"),
      countDistinct("rn").as("n")).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == 50000L &&
      stats.getLong(2) == 50000L)
  }
}

package graft.ops


import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing (the 100 TB join-strategy claim,
  * SURVEY.md §4.3 / README scale notes): two tables bucketed by the
  * join key into the same bucket count join WITHOUT a shuffle — the
  * physical plan has no Exchange on either side. This is the standing
  * answer to "is there a shuffle here that becomes the bottleneck at
  * 100×": pre-bucket the fact tables on their join keys once, then
  * every downstream join is exchange-free. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero Exchange in the plan") {
    // tables land in the default warehouse dir (gitignored); dropped in
    // the finally block
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // disable auto-broadcast so the join strategy is decided by
    // co-location, not by table size
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderstatus")
      // the JOIN must be exchange-free: bucketed layout satisfies the
      // join's distribution requirement on both sides
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // and it computes the same result as the plain parquet join
      val expected = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderstatus")
        .collect().map(_.toSeq).toSet
      val got = joined.collect().map(_.toSeq).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}

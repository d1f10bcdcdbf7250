package graft.ops

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** The co-located join contract: same-bucketed tables join with zero
  * Exchange operators, while the identical join over plain parquet
  * shuffles both sides. Broadcast is disabled for the duration so the
  * comparison is shuffle-vs-no-shuffle at the SortMergeJoin strategy
  * both plans would use at data scale (where neither side broadcasts
  * anyway). */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withNoBroadcast[A](body: => A): A = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe =
      conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
  }

  test("same-bucketed orders ⋈ lineitem plans with zero Exchange; plain parquet shuffles") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    BucketedTables.writeBucketed(orders, "bkt_orders", 8, "o_orderkey")
    BucketedTables.writeBucketed(lineitem, "bkt_lineitem", 8, "o_orderkey")

    withNoBroadcast {
      val co = BucketedTables.colocatedJoin(
        spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
      // bucketed distribution is a STATIC planning property (AQE never
      // adds an exchange the initial plan didn't need), so the helper
      // checks the static plan
      assert(BucketedTables.isShuffleFreeJoin(co),
        s"expected exchange-free join, got:\n${co.queryExecution.executedPlan}")

      // the same join over plain parquet MUST shuffle both sides —
      // this is the repeated cost bucketing converts to a write-once
      val plain = orders.join(lineitem, Seq("o_orderkey"))
      val p = plain.queryExecution.executedPlan.toString
      assert(p.contains("Exchange hashpartitioning"),
        s"expected shuffles in:\n$p")

      // identical CONTENT (multiset) either layout — row counts alone
      // would pass a layout bug that mispairs rows while preserving
      // cardinality
      val got = co.collect().map(_.toSeq.toString).sorted.toSeq
      val expected = plain.collect().map(_.toSeq.toString).sorted.toSeq
      assert(got.nonEmpty && got == expected)
    }
  }

  test("mismatched bucket counts fall back to a shuffle on one side only") {
    val orders = Tables.orders(spark, sf).select(col("o_orderkey"))
    val lineitem = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"))
    BucketedTables.writeBucketed(orders, "bkt_orders8", 8, "o_orderkey")
    BucketedTables.writeBucketed(lineitem, "bkt_lineitem4", 4, "o_orderkey")
    withNoBroadcast {
      val j = BucketedTables.colocatedJoin(
        spark, "bkt_orders8", "bkt_lineitem4", "o_orderkey")
      // static plan (see above): exactly one Exchange — the 4-bucket
      // side re-hashes to 8 while the 8-bucket side still scans
      // bucketed
      val p = j.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(p).size == 1, s"plan:\n$p")
      assert(p.contains("Bucketed: true"), s"plan:\n$p")
      assert(j.count() > 0)
    }
  }
}

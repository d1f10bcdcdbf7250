package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share key 1 — the classic dominant-key skew.
  private lazy val big = (1 to 1000)
    .map(i => (if (i <= 900) 1L else i.toLong, s"v$i"))
    .toDF("k", "payload")
  private lazy val small = Seq((1L, "one"), (950L, "x"), (999L, "y"))
    .toDF("k", "name")

  test("salted join == plain join, rows spread across salt buckets") {
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val salted = SaltedJoin(big, small, "k", buckets = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 902)

    // the dominant key's rows really do get distinct salt values
    val saltSpread = big
      .withColumn("_salt", pmod(hash(col("payload")), lit(8)))
      .where(col("k") === 1).select("_salt").distinct().count()
    assert(saltSpread == 8)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    val plain = big.join(small, Seq("k"), "left")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val salted = SaltedJoin(big, small, "k", buckets = 4, joinType = "left")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }
}

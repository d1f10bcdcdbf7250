package graft.ops

import org.apache.spark.sql.functions.lit

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), // before any right row → nulls
    (2L, 100L, 20L), // exactly at a right ts → <= matches it
    (3L, 100L, 35L), // between right rows → latest earlier wins
    (4L, 200L, 50L)  // key with no right rows at all
  ).toDF("event_id", "user_id", "ts")

  private val right = Seq(
    (100L, 20L, 7L, "a"),
    (100L, 20L, 9L, "b"), // tie on (key, ts): max id (9) wins
    (100L, 30L, 11L, "c")
  ).toDF("user_id", "ts", "rid", "tag")

  test("as-of semantics: <=, latest-earlier, tie-dedupe, missing-key nulls") {
    val out = AsOfJoin(left, right, Seq("user_id"), "ts", "ts",
      payload = Seq("rid", "tag"))
      .select("event_id", "asof_rid", "asof_tag")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.getString(2))))
      .toSet
    assert(out == Set(
      (1L, None, None),
      (2L, Some(9L), Some("b")),
      (3L, Some(11L), Some("c")),
      (4L, None, None)))
  }

  test("NULL keys never match each other (SQL join semantics)") {
    val l = Seq((1L, Option.empty[Long], 50L), (2L, Option(100L), 50L))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((Option.empty[Long], 10L, 7L), (Option(100L), 10L, 8L))
      .toDF("user_id", "ts", "rid")
    val out = AsOfJoin(l, r, Seq("user_id"), "ts", "ts", payload = Seq("rid"))
      .select("event_id", "asof_rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)))).toMap
    // the null-keyed left row must NOT pick up the null-keyed right row
    assert(out == Map(1L -> None, 2L -> Some(8L)))
  }

  test("NULL timestamps never match (ASOF's <= predicate)") {
    val l = Seq((1L, 100L, Option(50L)), (2L, 100L, Option.empty[Long]))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((100L, Option.empty[Long], 7L), (100L, Option(10L), 8L))
      .toDF("user_id", "ts", "rid")
    val out = AsOfJoin(l, r, Seq("user_id"), "ts", "ts", payload = Seq("rid"))
      .select("event_id", "asof_rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)))).toMap
    // the NULL-ts right row must not carry onto anyone (it would
    // otherwise sort first and serve every left row of key 100);
    // the NULL-ts left row matches nothing
    assert(out == Map(1L -> Some(8L), 2L -> None))
  }

  test("reserved __ column names are rejected loudly") {
    val bad = left.withColumnRenamed("ts", "__ts").withColumn("ts", lit(1L))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(bad, right, Seq("user_id"), "ts", "ts", payload = Seq("rid"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("empty key list = global carry-forward join") {
    val out = AsOfJoin(left, right, Seq.empty, "ts", "ts",
      payload = Seq("rid"))
      .select("event_id", "asof_rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)))).toMap
    // rights at ts=20 (rid 9 after tie-dedupe) and ts=30 serve ALL
    // left rows regardless of user_id
    assert(out == Map(1L -> None, 2L -> Some(9L), 3L -> Some(11L),
      4L -> Some(11L)))
  }

  test("left columns and row count survive unchanged") {
    val out = AsOfJoin(left, right, Seq("user_id"), "ts", "ts",
      payload = Seq("rid"))
    assert(out.count() == 4)
    assert(Seq("event_id", "user_id", "ts", "asof_rid")
      .forall(out.columns.contains))
  }
}

package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Registry-wide execution spec at sf0.001: every query runs, has the
  * oracle's column names, and the structurally-guaranteed ones return
  * rows. (The value-level gate is the DuckDB compare — tools/check.py.) */
class QueriesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // Queries whose result can legitimately be empty at tiny SF
  // (near-dup pairs depend on planted duplicates).
  private val mayBeEmpty = Set("t2_minhash_lsh", "t4_ngram_jaccard")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle (add one or mark rows-only): $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // gate-output convention: scalar columns only (the driver's
      // pandas checker dies on array/map/struct cells — r12 t41b/t44)
      graft.Verify.guardScalarOutput(name, df.schema)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("guardScalarOutput rejects array/map/struct, passes scalars") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val scalar = Seq((1L, "a")).toDF("x", "y")
    graft.Verify.guardScalarOutput("ok", scalar.schema)
    val arr = scalar.select(col("x"), array(col("y")).as("ys"))
    val e = intercept[IllegalStateException] {
      graft.Verify.guardScalarOutput("bad", arr.schema)
    }
    assert(e.getMessage.contains("ys") && e.getMessage.contains("f15"))
    val mp = scalar.select(map(col("y"), col("x")).as("m"))
    intercept[IllegalStateException] {
      graft.Verify.guardScalarOutput("bad2", mp.schema)
    }
    val st = scalar.select(struct(col("x")).as("s"))
    intercept[IllegalStateException] {
      graft.Verify.guardScalarOutput("bad3", st.schema)
    }
  }
}

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
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}

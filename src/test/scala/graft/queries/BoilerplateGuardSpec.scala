package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Pins t37's degenerate-document guard: Spark's `sequence(a, b)`
  * DESCENDS when b < a, so a null-text document (tokens → null,
  * block count → null) must be screened to an empty block array — not
  * poisoned into blocks at indices [0, -1] (t43 carries the same
  * guard for its W-token windows). */
class BoilerplateGuardSpec extends SparkSpec {
  import spark.implicits._

  test("t37 handles null/empty/short/long docs without sequence poison") {
    val dir = Files.createTempDirectory("graft-t37").toString
    Seq(
      (1L, Option("one two three four five")), // 5 toks  → 1 block
      (2L, Option(Seq.tabulate(25)(i => s"w$i").mkString(" "))), // → 3 blocks
      (3L, Option("")), // normText("") → [""], size 1 → 1 (empty) block
      (4L, Option.empty[String]) // null text → zero blocks → dropped
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = TextQueries.t37BlockBoilerplate.run(spark, dir)
      .select("doc_id", "n_blocks", "n_boiler")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(out == Map(
      1L -> ((1L, 0L)),
      2L -> ((3L, 0L)),
      3L -> ((1L, 0L))), s"unexpected block counts: $out")
    assert(!out.contains(4L), "null-text doc must be screened out")
  }
}

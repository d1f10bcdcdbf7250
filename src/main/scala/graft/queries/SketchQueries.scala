package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.tokens

/** Count–min sketch frequency estimation over the corpus token stream
  * (Cormode & Muthukrishnan) — the fixed-memory answer to "how often
  * does each term occur" when the distinct-term table itself is too
  * big to keep: d hash rows × w buckets of counters bound the state at
  * d·w cells for ANY corpus size, every estimate over-counts only
  * (est ≥ exact, whp within εN), and the sketch is a pure aggregate —
  * mergeable across partitions, streams, and days.
  *
  * Spark shape: one explode of the token stream fans each instance to
  * its d (row, bucket) cells; ONE groupBy((row, bucket)) with map-side
  * partial aggregation reduces the corpus to ≤ d·w rows — the shuffle
  * carries at most d·w rows per partition no matter how many tokens
  * scan in. Estimation joins the probe set to the broadcast-sized
  * sketch. Hashes are the house portable md5 base + Carter–Wegman
  * mixing (TextAnalysis.minhashA/B), so the DuckDB oracle reproduces
  * every cell exactly. */
object SketchQueries {

  private[queries] val CmsD = 4 // hash rows
  private[queries] val CmsW = 1024 // buckets per row
  private[queries] val CmsTopK = 20 // probe set: exact top-K tokens

  private val P = TextAnalysis.MinhashP

  /** Portable scalar token hash (the minhashBase formula, un-arrayed). */
  private[queries] def baseHash(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % P

  private[queries] def bucket(base: Column, j: Int): Column =
    (base * TextAnalysis.minhashA(j) + TextAnalysis.minhashB(j)) % P % CmsW

  private def baseHashSql(tok: String): String =
    s"CAST(concat('0x', substr(md5($tok), 1, 15)) AS BIGINT) % $P"

  private def bucketSql(base: String, j: Int): String =
    s"($base * ${TextAnalysis.minhashA(j)} + ${TextAnalysis.minhashB(j)}) % $P % $CmsW"

  /** T52 — CMS HEAVY HITTERS: build the sketch over every token
    * instance, then probe it with the exact top-[[CmsTopK]] tokens and
    * report estimate vs truth. The `over_n` column is the sketch's
    * collision inflation — ≥ 0 by construction (CMS never
    * undercounts), and the gate row pins that the whole estimation
    * path (hashing, cell aggregation, min-of-rows) is bit-identical
    * across engines. */
  val t52CmsHeavyHitters: QuerySpec = {
    import TextQueries.ToksSql
    QuerySpec.sql(
      "t52_cms_heavy_hitters",
      s"""WITH ti AS (SELECT word, ${baseHashSql("word")} AS h
         |  FROM (SELECT unnest($ToksSql) AS word FROM documents)
         |  WHERE word <> ''),
         |cells AS (
         |  ${(0 until CmsD).map(j =>
          s"SELECT ${bucketSql("h", j)} AS bkt, $j AS row_id FROM ti")
          .mkString("\n  UNION ALL\n  ")}
         |),
         |sketch AS (SELECT row_id, bkt, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM cells GROUP BY 1, 2),
         |top AS (SELECT word, h, CAST(COUNT(*) AS BIGINT) AS exact_n
         |  FROM ti GROUP BY word, h
         |  ORDER BY exact_n DESC, word LIMIT $CmsTopK),
         |probes AS (
         |  ${(0 until CmsD).map(j =>
          s"""SELECT word, exact_n, $j AS row_id,
             |    ${bucketSql("h", j)} AS bkt FROM top""".stripMargin)
          .mkString("\n  UNION ALL\n  ")}
         |),
         |est AS (SELECT p.word, p.exact_n, MIN(s.c) AS est_n
         |  FROM probes p JOIN sketch s USING (row_id, bkt)
         |  GROUP BY 1, 2)
         |SELECT word, exact_n, est_n, est_n - exact_n AS over_n
         |FROM est
         |ORDER BY exact_n DESC, word""".stripMargin) { (s, d) =>
      val ti = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .select(col("word"), baseHash(col("word")).as("h"))
      val cells = ti.select(
        posexplode(array((0 until CmsD).map(j => bucket(col("h"), j)): _*))
          .as(Seq("row_id", "bkt")))
      val sketch = cells.groupBy("row_id", "bkt")
        .agg(count(lit(1)).as("c"))
      val top = ti.groupBy("word", "h").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("word")).limit(CmsTopK)
      val probes = top.select(col("word"), col("exact_n"),
        posexplode(array((0 until CmsD).map(j => bucket(col("h"), j)): _*))
          .as(Seq("row_id", "bkt")))
      broadcast(probes)
        .join(sketch, Seq("row_id", "bkt"))
        .groupBy("word", "exact_n")
        .agg(min("c").as("est_n"))
        .select(col("word"), col("exact_n"), col("est_n"),
          (col("est_n") - col("exact_n")).as("over_n"))
        .orderBy(col("exact_n").desc, col("word"))
    }
  }

  val all: Seq[QuerySpec] = Seq(t52CmsHeavyHitters)
}

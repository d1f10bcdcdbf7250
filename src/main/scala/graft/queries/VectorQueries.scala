package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the correctness baseline and a
  * sign-bit LSH-bucketed variant as the scale path.
  *
  * Float discipline: each COORDINATE is scaled once to a long
  * (`round(x·1e6)` with a branch-explicit half-away formula — every
  * step an IEEE-deterministic double op both engines compute
  * identically); dot products are then pure long multiply-adds, exact
  * and order-independent, so results are bit-identical across engines
  * with NO floating point on the pair-stage hot path. Scaling per
  * VECTOR (n·64 roundings) instead of per PAIR (pairs·64) is the big
  * win: the brute-force stage does only long arithmetic per candidate.
  * Bounds: |x|≲1 → coords ≤ ~1e6, products ≤ ~1e12, 64-term sums ≤
  * ~6.4e13 « 2^63.
  *
  * Scale shape: dot products and norms are computed PER ROW with
  * `zip_with`/`aggregate` higher-order functions — no element explode,
  * no 64×-row blow-up, no shuffle for the reductions. Norms ride along
  * in the projections, so there are zero auxiliary joins. Brute force
  * is a broadcast of the (small) query set against the corpus —
  * shuffle-free up to the final top-k window; the LSH variant turns
  * all-pairs into per-bucket joins (bucket key = 6 sign bits), the
  * standard way to keep ANN sub-quadratic on a cluster. */
object VectorQueries {

  /** round-half-away-from-zero via floor — identical formula on the
    * DuckDB side, so parity is by construction, not by trusting two
    * engines' round() tie rules. */
  private def rnd(v: Column): Column =
    when(v >= 0, floor(v + 0.5)).otherwise(-floor(-v + 0.5))

  /** Per-vector scaling: float coords → longs at 1e6. */
  private[queries] def scaleL(e: Column): Column =
    transform(e, x => rnd(x.cast("double") * lit(1e6)).cast("long"))

  private def sumL(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x)

  /** Exact long dot product of two pre-scaled vectors, at 1e-12. */
  private[queries] def dotL(a: Column, b: Column): Column =
    sumL(zip_with(a, b, (x, y) => x * y)).cast("double") / lit(1e12)

  private def normSqL(eL: Column): Column =
    sumL(transform(eL, x => x * x)).cast("double") / lit(1e12)

  /** Embeddings with the scaled vector and squared norm per row. */
  private def embScaled(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        scaleL(col("embedding")).as("eL"))
      .withColumn("ss", normSqL(col("eL")))

  /** SQL twin of scaleL — keep in lockstep. */
  private[queries] def scaledSql(a: String): String = {
    val v = s"(CAST($a AS DOUBLE) * 1e6)"
    s"CAST(CASE WHEN $v >= 0 THEN floor($v + 0.5) ELSE -floor(-$v + 0.5) END AS BIGINT)"
  }

  private[queries] def prodLSql(a: String, b: String): String =
    s"(${scaledSql(a)} * ${scaledSql(b)})"

  private val NormsSql =
    s"""SELECT vec_id, CAST(SUM(${prodLSql("x", "x")}) AS DOUBLE) / 1e12 AS ss
       |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id""".stripMargin

  /** T5 — brute-force cosine top-5 for the first 10 query vectors. */
  val t5AnnBruteForce: QuerySpec = QuerySpec.sql(
    "t5_ann_brute_force",
    s"""WITH sq AS ($NormsSql),
       |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
       |prods AS (
       |  SELECT qid, e.vec_id AS nid,
       |    ${prodLSql("qe[i+1]", "e.embedding[i+1]")} AS p
       |  FROM q, embeddings e, range(0, 64) t(i)
       |  WHERE e.vec_id <> qid
       |),
       |dots AS (SELECT qid, nid, CAST(SUM(p) AS DOUBLE) / 1e12 AS dot FROM prods GROUP BY 1, 2),
       |cos AS (
       |  SELECT qid, nid, dot / (sqrt(a.ss) * sqrt(b.ss)) AS cosine
       |  FROM dots JOIN sq a ON qid = a.vec_id JOIN sq b ON nid = b.vec_id
       |),
       |ranked AS (
       |  SELECT qid, nid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
       |  FROM cos
       |)
       |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin) { (s, d) =>
    val emb = embScaled(s, d)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("eL").as("qL"), col("ss").as("ss_a"))
    val cos = broadcast(q)
      .crossJoin(emb.select(col("vec_id").as("nid"), col("eL").as("nL"),
        col("ss").as("ss_b")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        (dotL(col("qL"), col("nL")) / (sqrt(col("ss_a")) * sqrt(col("ss_b"))))
          .as("cosine"))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    cos.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  /** T10 — LSH-bucketed ANN: bucket key = sign bits of the first 6
    * dimensions (random-hyperplane LSH with axis hyperplanes); cosine
    * top-3 within each bucket. Recall trades against the all-pairs cost
    * — the bucket join is the 100 TB-viable plan. */
  val t10AnnLshBuckets: QuerySpec = {
    val bucketSqlFor = (alias: String) => (1 to 6).map(i =>
      s"CASE WHEN $alias.embedding[$i] >= 0 THEN '1' ELSE '0' END").mkString("concat(", ", ", ")")
    QuerySpec.sql(
      "t10_ann_lsh_buckets",
      s"""WITH sq AS ($NormsSql),
         |b AS (SELECT vec_id, embedding, ${bucketSqlFor("embeddings")} AS bucket FROM embeddings),
         |pairs AS (
         |  SELECT x.vec_id AS qid, y.vec_id AS nid, x.bucket, x.embedding AS qe, y.embedding AS ne
         |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
         |),
         |dots AS (
         |  SELECT qid, nid, bucket, CAST(SUM(p) AS DOUBLE) / 1e12 AS dot
         |  FROM (
         |    SELECT qid, nid, bucket,
         |      ${prodLSql("qe[i+1]", "ne[i+1]")} AS p
         |    FROM pairs, range(0, 64) t(i)
         |  ) GROUP BY 1, 2, 3
         |),
         |cos AS (
         |  SELECT qid, nid, bucket, dot / (sqrt(a.ss) * sqrt(b2.ss)) AS cosine
         |  FROM dots JOIN sq a ON qid = a.vec_id JOIN sq b2 ON nid = b2.vec_id
         |),
         |ranked AS (
         |  SELECT qid, nid, bucket, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
         |  FROM cos
         |)
         |SELECT qid, rank, nid, bucket, cosine FROM ranked WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val bucket = concat((1 to 6).map(i =>
        when(element_at(col("embedding"), i) >= 0, "1").otherwise("0")): _*)
      val b = embScaled(s, d).withColumn("bucket", bucket)
      val cos = b.as("x")
        .join(b.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("qid"), col("y.vec_id").as("nid"),
          col("x.bucket").as("bucket"),
          (dotL(col("x.eL"), col("y.eL")) /
            (sqrt(col("x.ss")) * sqrt(col("y.ss")))).as("cosine"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
      cos.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("qid", "rank", "nid", "bucket", "cosine")
        .orderBy("qid", "rank")
    }
  }

  val all: Seq[QuerySpec] = Seq(t5AnnBruteForce, t10AnnLshBuckets)
}

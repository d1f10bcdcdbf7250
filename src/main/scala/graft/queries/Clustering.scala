package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared shapes for the cluster-resolution queries (t21/t26/t32/t35):
  * the output frame and the build-once-reuse registry, factored so the
  * lexical and semantic families cannot drift. */
private[queries] object Clustering {

  /** (idName, cluster_id, cluster_size, is_keeper) from a CC label
    * frame with columns (id, label). */
  def frame(cc: DataFrame, idName: String): DataFrame = {
    val sized = cc.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    cc.join(sized, "label")
      .select(col("id").as(idName), col("label").as("cluster_id"),
        col("cluster_size"), (col("id") === col("label")).as("is_keeper"))
  }

  /** Build-once-per-process registry: direct query runs always rebuild
    * (scale/bench numbers stay honest) and `record` the checkpointed
    * frame; composing consumers (t28, the parity gates) `reuse` it so
    * a composition never pays the iterative CC loop twice.
    *
    * Callers key entries with [[fingerprint]] over the backing table(s)
    * so an input dir rewritten in-process changes the key and the stale
    * checkpointed frame is never served (it rebuilds instead). */
  final class Memo[K] {
    private val m = new ConcurrentHashMap[K, DataFrame]
    def record(k: K, df: DataFrame): DataFrame = { m.put(k, df); df }
    def reuse(k: K)(build: => DataFrame): DataFrame =
      Option(m.get(k)).getOrElse(build)
  }

  /** Content fingerprint of the parquet inputs behind a memoized frame:
    * sorted (path, length, mtime) of every file under each table path.
    * Cheap (directory metadata only — no data read) relative to the CC
    * loop the memo guards, and exactly as stale-proof as the
    * filesystem's mtime resolution. */
  def fingerprint(dir: String, tables: String*): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    tables.flatMap(t => walk(new java.io.File(s"$dir/$t.parquet")))
      .sortBy(_.getPath)
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
      .mkString("|")
  }
}

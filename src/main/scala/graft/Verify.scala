package graft

import java.nio.file.{Files, Paths}

import graft.spark.Sessions

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Gate-output convention: scalar columns only. The driver's checker
    * sorts result rows with pandas sort_values, which dies on
    * array/map/struct cells (r12: t41b/t44 red with "unhashable type:
    * numpy.ndarray" in the HARNESS, masking two green operators).
    * Serialize lists with concat_ws/array_join (the f15 convention).
    * Throws at dump time so a violation fails ITS OWN gate row loudly
    * instead of erring later inside the driver's pandas. */
  def guardScalarOutput(name: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val bad = schema.fields.filter(_.dataType match {
      case _: ArrayType | _: MapType | _: StructType => true
      case _ => false
    })
    if (bad.nonEmpty) throw new IllegalStateException(
      s"gate query $name output has non-scalar column(s) " +
        bad.map(f => s"${f.name}: ${f.dataType.simpleString}")
          .mkString(", ") +
        " — serialize with array_join/concat_ws (f15 convention); " +
        "the driver's pandas sort cannot handle array cells")
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev seam: trailing args restrict the dump to the named queries
    // (fast iteration on a new operator); the driver passes none.
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(kv => only.contains(kv._1))
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        guardScalarOutput(name, df.schema)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        val msg = (e.getClass.getSimpleName + ": " +
          Option(e.getMessage).getOrElse("")).take(800)
        failures += name -> msg
        System.err.println(s"[verify] $name failed: $msg")
        // An erring query must still produce an output, or the gate's
        // per-query record silently OMITS it (r11: 4 analysis errors →
        // a 117-row all-green artifact that read as 100% pass). A
        // single `__error` row forces the downstream compare to record
        // an explicit schema-mismatch FAIL carrying the message.
        import spark.implicits._
        Seq(msg).toDF("__error").coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles =
      if (only.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.filter(kv => only.contains(kv._1))
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable failure list (query id → captured error), so a
    // consumer of the verify output alone sees n_failed without diffing
    // row counts against a previous round.
    val failedJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failed.json"), failedJson)
    spark.stop()
  }
}

package graft.tools

import graft.SparkEntry
import graft.spark.Sessions

/** Plan audit for any registered query: prints the formatted physical
  * plan (pushed filters, read schema, join strategies, codegen spans).
  * AQE finalizes joins at runtime — for runtime-final markers use
  * ScaleCheck, which executes and reports the adaptive plan.
  *
  * Usage: runMain graft.tools.Explain <query_name> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    SparkEntry.queries(name)(spark, sf).explain("formatted")
    spark.stop()
  }
}

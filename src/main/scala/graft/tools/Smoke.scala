package graft.tools

import graft.SparkEntry
import graft.spark.Sessions

/** Dev smoke main: exercises the driver's `entry` contract (rows>0 at
  * sf0.001) exactly as the harness will. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n (expect >0)")
    require(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}

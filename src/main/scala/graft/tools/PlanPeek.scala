package graft.tools
import graft.spark.Sessions
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    val sf = "/root/testdata/sf0.001"
    for (n <- args) {
      val df = graft.SparkEntry.queries(n)(spark, sf)
      df.queryExecution.toRdd.count()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      println(s"===== $n =====")
      println(p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort") || l.contains("HashAggregate") || l.contains("Window") || l.contains("Scan parquet")).mkString("\n"))
    }
    spark.stop()
  }
}

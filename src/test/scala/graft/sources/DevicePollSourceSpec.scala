package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DevicePollSourceSpec extends SparkSpec {
  import spark.implicits._

  private def load(extra: (String, String)*): DataFrame = {
    var r = spark.read.format("graft.sources.DevicePollSource")
      .option("devices", "10.0.0.1,10.0.0.2,10.0.0.3,10.0.0.4")
      .option("baseOid", SnmpPayload.SuppliesBase)
      .option("numPartitions", "2")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("DSv2 scan: all devices polled, walk-row schema") {
    val df = load()
    assert(df.columns.toSeq == Seq("ip", "oid", "value"))
    assert(df.select("ip").distinct().as[String].collect().toSet ==
      Set("10.0.0.1", "10.0.0.2", "10.0.0.3", "10.0.0.4"))
  }

  test("filter pushdown prunes the device list BEFORE polling") {
    DevicePollSource.pollCount.reset()
    val one = load().where($"ip" === "10.0.0.2")
    assert(one.select("ip").distinct().as[String].collect().toSet ==
      Set("10.0.0.2"))
    // pushdown is observable two ways: the physical plan advertises it,
    // and only ONE device was actually polled.
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("RuntimeFilters") ||
      DevicePollSource.pollCount.sum() == 1, plan)
    assert(DevicePollSource.pollCount.sum() == 1)
  }

  test("IN-list pushdown intersects; column pruning drops unused columns") {
    DevicePollSource.pollCount.reset()
    val two = load().where($"ip".isin("10.0.0.1", "10.0.0.3")).select("oid")
    assert(two.count() > 0)
    assert(DevicePollSource.pollCount.sum() == 2)
    val scanned = two.queryExecution.executedPlan.toString
    assert(!scanned.contains("value#")) // pruned from the read schema
  }

  test("per-device failure degrades to zero rows, scan completes") {
    // failEvery=1: every device hash % 1 == 0 → all throw → empty scan
    assert(load("failEvery" -> "1").count() == 0)
  }

  test("downstream composition: DSv2 rows feed the SNMP cartridge pipeline") {
    val supplies = load()
    val colorant = spark.read.format("graft.sources.DevicePollSource")
      .option("devices", "10.0.0.1,10.0.0.2,10.0.0.3,10.0.0.4")
      .option("baseOid", SnmpPayload.ColorantBase)
      .load()
    val carts = SnmpPayload.cartridges(supplies.union(colorant))
    assert(carts.count() == 4)
    assert(carts.columns.toSeq == Seq("ip", "cartridges"))
  }
}

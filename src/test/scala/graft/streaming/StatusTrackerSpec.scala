package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StatusTracker.{DeviceEvent, Transition}

class StatusTrackerSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    DeviceEvent(1, "online", 100), DeviceEvent(1, "online", 200),
    DeviceEvent(1, "offline", 300), DeviceEvent(1, "online", 400),
    DeviceEvent(2, "offline", 150), DeviceEvent(2, "offline", 250),
    DeviceEvent(3, "online", 10))

  private val expected = Set(
    Transition(1, "unknown", "online", 100),
    Transition(1, "online", "offline", 300),
    Transition(1, "offline", "online", 400),
    Transition(2, "unknown", "offline", 150),
    Transition(3, "unknown", "online", 10))

  test("batch ground truth: transitions via lag window") {
    val got = StatusTracker.batchTransitions(spark, events.toDS())
      .collect().map(t => t.copy(from = if (t.from == null) "unknown" else t.from))
      .toSet
    assert(got == expected)
  }

  test("flatMapGroupsWithState emits only transitions; state carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DeviceEvent]
    val query = StatusTracker.trackTransitions(input.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: first five events; batch 2: the rest — state must
      // remember device 1 was offline and device 2 stays offline.
      input.addData(events.take(5): _*)
      query.processAllAvailable()
      input.addData(events.drop(5): _*)
      query.processAllAvailable()
      val got = spark.table("transitions").as[Transition].collect().toSet
      assert(got == expected)
    } finally query.stop()
  }
}

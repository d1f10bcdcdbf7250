package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-device status state machine via
  * `flatMapGroupsWithState` (SURVEY.md §2.7's "custom state" slot).
  *
  * The reference's de-facto state machine lives across runs: a device
  * that answered last run but not this one flips to offline, and every
  * flip is what operators care about (status written back per run,
  * toner_hp.py:58-66). Streaming-native: keep (lastStatus, lastSeen)
  * per device, emit a row only on TRANSITIONS, and time out devices
  * that go silent — the processing-time timeout IS the poll timeout.
  *
  * Scale: state is one small case class per device key, partitioned by
  * the grouping key across executors; timeouts purge silent keys, so
  * state size tracks the live fleet, not history.
  */
object StatusTracker {

  final case class DeviceEvent(deviceId: Long, status: String, tsNanos: Long)
  final case class DeviceState(lastStatus: String, lastSeenNanos: Long)
  final case class Transition(deviceId: Long, from: String, to: String,
      atNanos: Long)

  val OfflineStatus = "offline"

  def trackTransitions(events: Dataset[DeviceEvent],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (id: Long, evs: Iterator[DeviceEvent], state: GroupState[DeviceState]) =>
          if (state.hasTimedOut) {
            // silent device → offline flip (the reference's unreachable
            // default), state retained for the next answer
            val prev = state.get
            state.update(DeviceState(OfflineStatus, prev.lastSeenNanos))
            if (prev.lastStatus != OfflineStatus)
              Iterator(Transition(id, prev.lastStatus, OfflineStatus,
                prev.lastSeenNanos))
            else Iterator.empty
          } else {
            // Event order within a micro-batch is not guaranteed: sort
            // by event time (explicit-order discipline, SURVEY.md §4.3).
            val sorted = evs.toSeq.sortBy(_.tsNanos)
            var cur = state.getOption
            val out = Seq.newBuilder[Transition]
            sorted.foreach { e =>
              cur match {
                case Some(DeviceState(last, _)) if last != e.status =>
                  out += Transition(id, last, e.status, e.tsNanos)
                case None =>
                  out += Transition(id, "unknown", e.status, e.tsNanos)
                case _ => ()
              }
              cur = Some(DeviceState(e.status, e.tsNanos))
            }
            cur.foreach(state.update)
            out.result().iterator
          }
      }
  }

  /** Batch-mode ground truth for tests: transitions via lag window. */
  def batchTransitions(spark: SparkSession, events: Dataset[DeviceEvent])
      : Dataset[Transition] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("deviceId").orderBy("tsNanos")
    events.toDF()
      .withColumn("prev", lag("status", 1, "unknown").over(w))
      .where(col("prev") =!= col("status"))
      .select(col("deviceId"), col("prev").as("from"), col("status").as("to"),
        col("tsNanos").as("atNanos"))
      .as[Transition]
  }
}

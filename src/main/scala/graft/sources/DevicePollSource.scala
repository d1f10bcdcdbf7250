package graft.sources

import java.util
import java.util.concurrent.atomic.LongAdder

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The device-poll fan-out promoted to a DataSourceV2 `TableProvider`
  * (SURVEY.md §4.1: the reference runs its bad-IP/model filters BEFORE
  * the network loop as *manual* pushdown; `mapPartitions` keeps that
  * manual. This source makes it automatic — Catalyst pushes `ip`
  * predicates into the scan, so filtered-out devices are NEVER polled,
  * and column pruning drops unneeded output columns).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.DevicePollSource")
  *     .option("devices", "10.0.0.1,10.0.0.2")
  *     .option("baseOid", SnmpPayload.SuppliesBase)
  *     .option("numPartitions", "8")      // poll parallelism
  *     .option("failEvery", "17")         // fake-client failure cadence
  *     .load()
  *     .where($"ip" === "10.0.0.1")       // pushed: only this device polled
  * }}}
  *
  * The network client stays the [[DeviceClient]] seam
  * ([[DeterministicSnmpFake]] in this zero-egress build). Schema is
  * the walk-row shape (ip, oid, value). */
class DevicePollSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DevicePoll.WalkSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DevicePollTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object DevicePollSource {
  /** Polls actually performed (test observability for pushdown). */
  val pollCount = new LongAdder
}

final class DevicePollTable(props: Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = "graft_device_poll"
  override def schema(): StructType = DevicePoll.WalkSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DevicePollScanBuilder(props ++ options.asScala)
}

final class DevicePollScanBuilder(opts: Map[String, String])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = DevicePoll.WalkSchema
  private var pushed: Array[Filter] = Array.empty
  private var ipFilter: Option[Set[String]] = None

  /** Accept ip equality/membership — those prune the DEVICE LIST, the
    * expensive dimension. Everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("ip", _: String) => true
      case In("ip", _) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("ip", v: String) =>
        ipFilter = Some(ipFilter.getOrElse(Set(v)).intersect(Set(v)))
      case In("ip", vs) =>
        val s = vs.collect { case x: String => x }.toSet
        ipFilter = Some(ipFilter.map(_.intersect(s)).getOrElse(s))
      case _ => ()
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan = {
    val devices = opts.getOrElse("devices", "").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq.distinct
    val polled = ipFilter.fold(devices)(f => devices.filter(f))
    new DevicePollScan(polled,
      opts.getOrElse("baseoid", SnmpPayload.SuppliesBase),
      opts.getOrElse("numpartitions", "4").toInt,
      opts.getOrElse("failevery", "0").toInt,
      requiredSchema)
  }
}

final case class DevicePartition(ips: Seq[String]) extends InputPartition

final class DevicePollScan(devices: Seq[String], baseOid: String,
    numPartitions: Int, failEvery: Int, required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_device_poll [devices=${devices.size}, oid=$baseOid]"

  override def planInputPartitions(): Array[InputPartition] =
    devices.grouped(math.max(1, math.ceil(devices.size.toDouble /
      numPartitions).toInt)).map(DevicePartition(_)).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val oid = baseOid; val fe = failEvery; val req = required
    (partition: InputPartition) =>
      new DevicePollReader(partition.asInstanceOf[DevicePartition].ips, oid, fe, req)
  }
}

final class DevicePollReader(ips: Seq[String], baseOid: String,
    failEvery: Int, required: StructType) extends PartitionReader[InternalRow] {

  private val client = new DeterministicSnmpFake(failEvery)
  private val it: Iterator[InternalRow] = ips.iterator.flatMap { ip =>
    DevicePollSource.pollCount.increment()
    // per-device failure degrades to zero rows, never aborts the scan
    Try(client.walk(ip, baseOid)).getOrElse(Seq.empty).iterator.map {
      case (oid, value) =>
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "ip" => UTF8String.fromString(ip)
          case "oid" => UTF8String.fromString(oid)
          case "value" => UTF8String.fromString(value)
        })
    }
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (it.hasNext) { current = it.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

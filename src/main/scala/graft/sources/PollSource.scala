package graft.sources

import java.time.Instant
import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 micro-batch polling source — the Spark-native form of
  * the reference's NiFi `InvokeHTTP` timer DAG (SURVEY §2.1 S5): each
  * micro-batch covers the wall-clock window since the last batch
  * (plus an initial lookback), and the batch's rows are the fetched
  * payloads for that window. Offsets are epoch-millis, so the
  * checkpoint gives exactly-once windows across restarts — the
  * property the reference approximates with overlapping re-polls.
  *
  *   spark.readStream.format("graft-poll")
  *     .option("fetcher", "<registered name>")
  *     .option("lookbackSec", "1200")
  *     .load()
  *
  * Fetchers are process-local functions registered in
  * [[PollFetchers]] (production registers an HTTP GET; tests register
  * fakes — the container has no egress). Schema:
  * (window_start TIMESTAMP, window_end TIMESTAMP, value BINARY) —
  * `value` feeds EarthquakeOps.parseEvents unchanged.
  */
class PollSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-poll"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PollSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PollTable(properties.getOrDefault("fetcher", "default"),
      properties.getOrDefault("lookbacksec", "1200").toLong)
}

object PollSource {
  val schema: StructType = StructType(Seq(
    StructField("window_start", TimestampType, nullable = false),
    StructField("window_end", TimestampType, nullable = false),
    StructField("value", BinaryType, nullable = true)))
}

/** Process-local fetcher registry (DSv2 options are strings; the
  * function itself can't ride through them). */
object PollFetchers {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (Instant, Instant) => String]()
  @volatile var clock: () => Instant = () => Instant.now()

  def register(name: String, fetch: (Instant, Instant) => String): Unit =
    registry.put(name, fetch)
  def get(name: String): (Instant, Instant) => String = {
    val f = registry.get(name)
    require(f != null, s"no poll fetcher registered under '$name'")
    f
  }
}

class PollTable(fetcherName: String, lookbackSec: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-poll($fetcherName)"
  override def schema(): StructType = PollSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new PollScan(fetcherName, lookbackSec)
}

class PollScan(fetcherName: String, lookbackSec: Long) extends Scan {
  override def readSchema(): StructType = PollSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PollMicroBatchStream(fetcherName, lookbackSec)
}

case class PollOffset(ms: Long) extends Offset {
  override def json(): String = ms.toString
}

class PollMicroBatchStream(fetcherName: String, lookbackSec: Long)
    extends MicroBatchStream {
  override def initialOffset(): Offset =
    PollOffset(PollFetchers.clock().toEpochMilli - lookbackSec * 1000L)
  override def latestOffset(): Offset =
    PollOffset(PollFetchers.clock().toEpochMilli)
  override def deserializeOffset(json: String): Offset =
    PollOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(PollPartition(fetcherName,
      start.asInstanceOf[PollOffset].ms, end.asInstanceOf[PollOffset].ms))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PollPartition]
      new PartitionReader[InternalRow] {
        private var done = p.endMs <= p.startMs
        private var row: InternalRow = _
        override def next(): Boolean = {
          if (done) return false
          val payload = PollFetchers.get(p.fetcher)(
            Instant.ofEpochMilli(p.startMs), Instant.ofEpochMilli(p.endMs))
          row = new GenericInternalRow(Array[Any](
            p.startMs * 1000L, p.endMs * 1000L,
            if (payload == null) null else payload.getBytes("UTF-8")))
          done = true
          true
        }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
}

case class PollPartition(fetcher: String, startMs: Long, endMs: Long)
  extends InputPartition

package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 wrapper over the Active911 connector ring (SURVEY.md
  * §7.4 stretch; reference wire surface task.ts:98-152): the wire source
  * participates in Catalyst like every other scan —
  *
  * {{{
  * spark.read.format("graft.sources.Active911DataSource")
  *   .option("username", ...).option("password", ...)
  *   .option("agencies", "101,102")   // optional; empty = all accessible
  *   .option("nowMs", "1765200000000")
  *   .load()
  * }}}
  *
  * Planning (driver): ONE login (token reuse, reference CHANGELOG
  * v2.5.0), agency validation (J1 throw on inaccessible), then one
  * [[InputPartition]] PER AGENCY. Execution (executors): each partition
  * fetches its agency's 6-hour envelope — at fleet scale the per-agency
  * HTTP fan-out runs in parallel across the cluster instead of
  * sequentially on the driver like the reference (task.ts:128 loop).
  *
  * Error channel (E1): a transport failure becomes a DATA row
  * `(agency_id, raw=null, fetch_error=msg)` instead of driver-side
  * mutable state — the accumulate-then-throw contract is then a plain
  * filter over the scan output (errors-as-data is the only shape that
  * survives distribution; a driver-side `errs` list cannot). Rows with
  * `fetch_error IS NULL` feed [[graft.ops.Active911.pipeline]]
  * unchanged; API-error envelopes still route via
  * [[graft.ops.Active911.envelopeErrors]] downstream.
  *
  * The transport is injected through [[Active911DataSource.transport]]
  * (a process-wide registry): DSv2 instantiates providers reflectively
  * from the format string, so a live object cannot arrive via string
  * options. Production assigns the real HTTP transport at boot; specs
  * assign mocks. The transport must be [[Serializable]] — it ships
  * inside the reader factory to executors.
  */
object Active911DataSource {
  @volatile var transport: Active911Transport = _

  val SCHEMA: StructType = StructType(Seq(
    StructField("agency_id", IntegerType, nullable = false),
    StructField("raw", StringType, nullable = true),
    StructField("fetch_error", StringType, nullable = true)))
}

class Active911DataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Active911DataSource.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new Active911Table
}

class Active911Table extends Table with SupportsRead {
  override def name(): String = "active911"
  override def schema(): StructType = Active911DataSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Active911ScanBuilder(options)
}

class Active911ScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder {
  override def build(): Scan = new Active911Scan(options)
}

/** One fetch assignment: everything an executor needs, nothing mutable. */
case class Active911InputPartition(agencyId: Int, token: String,
                                   fromMs: Long, toMs: Long) extends InputPartition

class Active911Scan(options: CaseInsensitiveStringMap) extends Scan with Batch {
  override def readSchema(): StructType = Active911DataSource.SCHEMA
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val t = Active911DataSource.transport
    require(t != null,
      "Active911DataSource.transport not set (assign the HTTP transport at boot)")
    val conn = new Active911Connector(t)
    val requested = Option(options.get("agencies")).map(_.trim)
      .filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil)
    val cfg = Active911Config(options.get("username"), options.get("password"),
      requested)
    val (token, accessible) = conn.login(cfg)
    val agencies = conn.validateAgencies(cfg.agencies, accessible)
    val (fromMs, toMs) = conn.window(options.get("nowMs").toLong)
    agencies.map(id =>
      Active911InputPartition(id, token, fromMs, toMs): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // the registry read happens HERE (driver) so the factory carries the
    // serialized transport — executors never touch the registry
    new Active911ReaderFactory(Active911DataSource.transport)
}

class Active911ReaderFactory(transport: Active911Transport)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[Active911InputPartition]
    new Active911PartitionReader(transport, p)
  }
}

class Active911PartitionReader(transport: Active911Transport,
                               p: Active911InputPartition)
    extends PartitionReader[InternalRow] {
  private var emitted = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (emitted) return false
    emitted = true
    row =
      try {
        val raw = transport.fetchAlerts(p.token, p.agencyId, p.fromMs, p.toMs)
        InternalRow(p.agencyId, UTF8String.fromString(raw), null)
      } catch {
        case e: Exception =>
          InternalRow(p.agencyId, null, UTF8String.fromString(e.getMessage))
      }
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

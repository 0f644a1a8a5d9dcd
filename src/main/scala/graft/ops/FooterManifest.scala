package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Executor-distributed parquet footer-manifest probe (r10, VERDICT-r9
  * #1 — the one named driver-side scale soft spot). The r9 bloom /
  * zone-map operators (q346/q354/q356/q358) each walked the layout's
  * files in a SERIAL DRIVER LOOP — `listStatus` → per-file
  * `ParquetFileReader.open` → footer stats + bloom probe — correct and
  * metadata-bound at 16 files, but at 100 TB (10⁵–10⁶ files on object
  * storage) a serial driver walk with per-file footer round-trips IS
  * the plan's bottleneck. This helper is the scale-safe form: ONE
  * directory listing on the driver (a single metadata RPC — the part a
  * table format's manifest would replace entirely), then the per-file
  * footer IO runs as a Spark job — `createDataset(paths)` spread
  * across the cluster, each task opening only its own files — and only
  * the per-file STATS (a few longs + booleans per block, bounded model
  * material) come back to the driver. Cost model: O(files/cluster)
  * wall-clock metadata reads + O(files) tiny rows collected, vs the r9
  * form's O(files) sequential round-trips. Each row carries whether its
  * footer was opened INSIDE a task (TaskContext present) so SourcesSpec
  * can PIN that the IO actually runs distributed, not on the driver —
  * the regression this helper exists to prevent. The count is derived
  * from the COLLECTED rows (ADVICE-r10): a retried or speculative task's
  * rows REPLACE its failed attempt's in the job result, so the proof is
  * exact under task retries, where an accumulator would double-count.
  *
  * Readers of the results (the four queries) keep their exact r9
  * decision logic — per-block range cover, bloom membership, file-level
  * boxes — so their oracles and contract booleans are unchanged.
  */
object FooterManifest {

  /** Driver-side running count of parquet footers REQUESTED through
    * this helper (every probe entry point adds its path count before
    * launching the job). The spec observable for the manifest
    * amortization contract (VERDICT-r10 #1): a lookup served from
    * staged manifest slices must leave this flat; an append must grow
    * it by exactly the new files. Monotone and process-wide — specs
    * diff snapshots around the calls they pin.
    */
  private[graft] val footerOpenRequests =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** One row group's footer view: per requested column its (min, max)
    * statistics, aligned to `cols`; per requested probe value whether
    * this block's bloom filter on `bloomCol` reports membership,
    * aligned to `probes` (all-false when the chunk carries no bloom —
    * parquet-mr omits it when the chunk stays fully dictionary-encoded).
    */
  case class BlockStat(lo: IndexedSeq[Long], hi: IndexedSeq[Long],
                       bloomHit: IndexedSeq[Boolean])

  case class FileFooter(path: String, blocks: IndexedSeq[BlockStat]) {
    /** File-level (min, max) for column index `c` — the zone-map box. */
    def range(c: Int): (Long, Long) =
      (blocks.map(_.lo(c)).min, blocks.map(_.hi(c)).max)
    /** Any block's bloom hits probe index `i` (file-level membership). */
    def anyBloomHit(i: Int): Boolean = blocks.exists(_.bloomHit(i))
    /** Some block both range-covers (col 0) and bloom-hits probe `i` —
      * the per-block AND a real reader applies before touching pages.
      */
    def blockCoveredHit(i: Int, v: Long): Boolean =
      blocks.exists(b => b.lo(0) <= v && v <= b.hi(0) && b.bloomHit(i))
  }

  /** Read footer stats for every `*.parquet` under `dir` as one Spark
    * job. `cols` are long-typed columns whose per-block min/max are
    * wanted; `probes` are values tested against `bloomCol`'s per-block
    * bloom filters (skipped entirely when `probes` is empty). Returns
    * the per-file footers (sorted by path — deterministic downstream
    * folds) plus the number of files whose footer was opened INSIDE a
    * task, which equals the file count iff the probe ran distributed.
    */
  def probe(s: SparkSession, dir: String, cols: Seq[String],
            bloomCol: String = null, probes: Seq[Long] = Nil)
      : (IndexedSeq[FileFooter], Long) = {
    val conf = new SerializableConfiguration(s.sessionState.newHadoopConf())
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf.value)
    // the ONE driver-side metadata call: a single listing RPC
    val paths = fs.listStatus(dirPath).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    probePaths(s, paths, cols, bloomCol, probes)
  }

  /** [[probe]] over an explicit file list (no listing) — the form a
    * per-file staged manifest slice uses (q360: each slice derives
    * from exactly one file's footer).
    */
  def probePaths(s: SparkSession, paths: Seq[String], cols: Seq[String],
                 bloomCol: String = null, probes: Seq[Long] = Nil)
      : (IndexedSeq[FileFooter], Long) = {
    // probes without a bloom column would yield EMPTY (not all-false)
    // bloomHit vectors, so anyBloomHit(i) would throw out-of-bounds on
    // the first block — reject the inconsistent call at entry instead
    // (review-r10 finding)
    require(probes.isEmpty || bloomCol != null,
      "probePaths: probes given but no bloomCol to test them against")
    val conf = new SerializableConfiguration(s.sessionState.newHadoopConf())
    if (paths.isEmpty) return (Vector.empty, 0L)
    footerOpenRequests.addAndGet(paths.size.toLong)
    // plain Seq/List in the task-side tuples: the product encoder's
    // collection support is pinned for Seq, and the stats are tiny
    val colsB: List[String] = cols.toList
    val probesB: List[Long] = probes.toList
    val bloomColB = Option(bloomCol)
    import s.implicits._
    val rows = s.createDataset(paths)
      // one task per file: footer reads are latency-bound round-trips,
      // the exact thing to spread; at 10⁶ files Spark caps tasks at the
      // scheduler's default parallelism anyway via partition coalescing
      .repartition(math.min(paths.size,
        s.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val hconf = conf.value
        it.map { p =>
          val inTask = TaskContext.get() != null
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p), hconf))
          try {
            val blocks = rd.getFooter.getBlocks.asScala.toList
            val stats: Seq[(Seq[Long], Seq[Long], Seq[Boolean])] =
              blocks.map { b =>
                def cc(name: String) = b.getColumns.asScala
                  .find(_.getPath.toDotString == name)
                  .getOrElse(sys.error(s"no footer stats for $name in $p"))
                val los: Seq[Long] = colsB.map(c =>
                  cc(c).getStatistics.genericGetMin
                    .asInstanceOf[java.lang.Long].longValue)
                val his: Seq[Long] = colsB.map(c =>
                  cc(c).getStatistics.genericGetMax
                    .asInstanceOf[java.lang.Long].longValue)
                val hits: Seq[Boolean] = bloomColB match {
                  case Some(bc) if probesB.nonEmpty =>
                    val bf = rd.getBloomFilterDataReader(b)
                      .readBloomFilter(cc(bc))
                    if (bf == null) probesB.map(_ => false)
                    else probesB.map(v => bf.findHash(bf.hash(v)))
                  case _ => Seq.empty[Boolean]
                }
                (los, his, hits)
              }
            (p, inTask, stats)
          } finally rd.close()
        }
      }.collect()
    val footers = rows.sortBy(_._1).map { case (p, _, stats) =>
      FileFooter(p, stats.map { case (los, his, hits) =>
        BlockStat(los.toIndexedSeq, his.toIndexedSeq, hits.toIndexedSeq)
      }.toIndexedSeq)
    }.toIndexedSeq
    (footers, rows.count(_._2).toLong)
  }

  /** Per-block (min, max) stats PLUS the footer bloom filter's bitset
    * bytes for one long-typed column, read as the same one-Spark-job
    * shape as [[probePaths]] — the manifest-build form (q362): the
    * bytes are persisted once per (file, block) so later lookups
    * reconstruct the filter from the manifest instead of reopening
    * footers. `bloom` is null when the writer omitted the filter
    * (fully dictionary-encoded chunk).
    */
  def probeBloomBytes(s: SparkSession, paths: Seq[String], column: String)
      : (IndexedSeq[(String, Int, Long, Long, Array[Byte])], Long) = {
    val conf = new SerializableConfiguration(s.sessionState.newHadoopConf())
    if (paths.isEmpty) return (Vector.empty, 0L)
    footerOpenRequests.addAndGet(paths.size.toLong)
    import s.implicits._
    val rows = s.createDataset(paths.toList)
      .repartition(math.min(paths.size,
        s.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val hconf = conf.value
        it.flatMap { p =>
          val inTask = TaskContext.get() != null
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p), hconf))
          try {
            rd.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
              case (b, bi) =>
                val cc = b.getColumns.asScala
                  .find(_.getPath.toDotString == column)
                  .getOrElse(sys.error(s"no footer stats for $column in $p"))
                val st = cc.getStatistics
                val bf = rd.getBloomFilterDataReader(b).readBloomFilter(cc)
                val bytes =
                  if (bf == null) null
                  else {
                    val bos = new java.io.ByteArrayOutputStream()
                    bf.writeTo(bos)
                    bos.toByteArray
                  }
                (p, bi, inTask,
                  st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue,
                  bytes)
            }
          } finally rd.close()
        }
      }.collect()
    (rows.sortBy(r => (r._1, r._2))
       .map(r => (r._1, r._2, r._4, r._5, r._6)).toIndexedSeq,
     rows.filter(_._3).map(_._1).distinct.length.toLong)
  }

  /** Distributed (no-collect) form of [[probeBloomBytes]] (r13,
    * ADVICE-r12 medium): the per-block manifest rows — (path, block,
    * lo, hi, bloom bitset bytes) for a LONG-typed column — as a
    * DataFrame whose footer IO runs in executors at EXECUTION time and
    * whose rows flow straight into the consumer's write. The collected
    * form puts every missing file's bloom bitset simultaneously
    * resident on the driver — at the 10⁶-file scale the batched cold
    * build targets, a driver OOM hazard; here the bitsets never leave
    * the executors ([[graft.ops.Staged.prepublishSlices]] writes the
    * frame partitioned by dep, so peak memory is per-task, not
    * per-layout). [[footerOpenRequests]] still counts at call time:
    * the builder below runs exactly once per file state under the
    * staging protocol, so request-counting semantics are unchanged for
    * the amortization specs.
    */
  def probeBloomBytesDF(s: SparkSession, paths: Seq[String],
                        column: String): org.apache.spark.sql.DataFrame = {
    val conf = new SerializableConfiguration(s.sessionState.newHadoopConf())
    footerOpenRequests.addAndGet(paths.size.toLong)
    import s.implicits._
    s.createDataset(paths.toList)
      .repartition(math.min(paths.size,
        s.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val hconf = conf.value
        it.flatMap { p =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p), hconf))
          try {
            rd.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
              case (b, bi) =>
                val cc = b.getColumns.asScala
                  .find(_.getPath.toDotString == column)
                  .getOrElse(sys.error(s"no footer stats for $column in $p"))
                val st = cc.getStatistics
                (p, bi,
                  st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue,
                  bloomBytesOf(rd, b, cc))
            }
          } finally rd.close()
        }
      }.toDF("path", "block", "lo", "hi", "bloom")
  }

  /** [[probeBloomBytesDF]] for a BINARY/STRING column (r13, VERDICT-r12
    * #1 — string-key manifested lookups): zone bounds are the footer
    * statistics' RAW BYTES (parquet orders binary min/max by unsigned
    * lexicographic comparison, and a truncated max is incremented to
    * stay an upper bound — so unsigned byte comparison downstream is
    * sound without ever decoding, including mid-codepoint truncation
    * that would corrupt a UTF-8 round-trip). Bloom bitsets as in the
    * long form; NULL when the writer omitted the filter.
    */
  def probeBloomBytesBinaryDF(s: SparkSession, paths: Seq[String],
                              column: String): org.apache.spark.sql.DataFrame = {
    val conf = new SerializableConfiguration(s.sessionState.newHadoopConf())
    footerOpenRequests.addAndGet(paths.size.toLong)
    import s.implicits._
    s.createDataset(paths.toList)
      .repartition(math.min(paths.size,
        s.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val hconf = conf.value
        it.flatMap { p =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p), hconf))
          try {
            rd.getFooter.getBlocks.asScala.toList.zipWithIndex.map {
              case (b, bi) =>
                val cc = b.getColumns.asScala
                  .find(_.getPath.toDotString == column)
                  .getOrElse(sys.error(s"no footer stats for $column in $p"))
                val st = cc.getStatistics
                (p, bi,
                  st.genericGetMin
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
                  st.genericGetMax
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
                  bloomBytesOf(rd, b, cc))
            }
          } finally rd.close()
        }
      }.toDF("path", "block", "lo", "hi", "bloom")
  }

  /** Task-side: one block's bloom bitset bytes for a column chunk, or
    * null when the writer omitted the filter (fully dictionary-encoded
    * chunk) — shared by the probe shapes above.
    */
  private def bloomBytesOf(
      rd: org.apache.parquet.hadoop.ParquetFileReader,
      b: org.apache.parquet.hadoop.metadata.BlockMetaData,
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Array[Byte] = {
    val bf = rd.getBloomFilterDataReader(b).readBloomFilter(cc)
    if (bf == null) null
    else {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
  }

  /** One PAGE of a column chunk's column index: its first row index
    * within the row group (from the offset index) and the page-level
    * (min, max) statistics (from the column index) — parquet's finest
    * data-skipping granularity below [[BlockStat]]'s row-group stats.
    */
  case class PageStat(path: String, block: Int, col: String, page: Int,
                      firstRow: Long, lo: Long, hi: Long)

  /** Read the PAGE-level column+offset indexes for long-typed `cols`
    * across `paths`, as the same one-Spark-job shape as [[probePaths]]
    * (executor-side footer IO, tiny stats rows back, in-task count for
    * the spec). Null pages are rejected — the layouts this serves are
    * written from non-nullable keys, and silently skipping a page
    * would understate the model comparison.
    */
  def probePages(s: SparkSession, paths: Seq[String], cols: Seq[String])
      : (IndexedSeq[PageStat], Long) = {
    val conf = new SerializableConfiguration(s.sessionState.newHadoopConf())
    if (paths.isEmpty) return (Vector.empty, 0L)
    footerOpenRequests.addAndGet(paths.size.toLong)
    val colsB: List[String] = cols.toList
    import s.implicits._
    val rows = s.createDataset(paths.toList)
      .repartition(math.min(paths.size,
        s.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val hconf = conf.value
        it.flatMap { p =>
          val inTask = TaskContext.get() != null
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(p), hconf))
          try {
            rd.getFooter.getBlocks.asScala.toList.zipWithIndex.flatMap {
              case (b, bi) =>
                colsB.flatMap { c =>
                  val cc = b.getColumns.asScala
                    .find(_.getPath.toDotString == c)
                    .getOrElse(sys.error(s"no column $c in $p"))
                  val ci = rd.readColumnIndex(cc)
                  val oi = rd.readOffsetIndex(cc)
                  require(ci != null && oi != null,
                    s"no page index for $c in $p (column indexes " +
                      "are written by default since parquet-mr 1.11)")
                  val mins = ci.getMinValues
                  val maxs = ci.getMaxValues
                  val nullPages = ci.getNullPages
                  def asLong(bb: java.nio.ByteBuffer): Long =
                    bb.duplicate()
                      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong(0)
                  (0 until oi.getPageCount).map { pg =>
                    require(!nullPages.get(pg),
                      s"null page $pg for $c in $p")
                    (p, bi, c, pg, oi.getFirstRowIndex(pg),
                      asLong(mins.get(pg)), asLong(maxs.get(pg)), inTask)
                  }
                }
            }
          } finally rd.close()
        }
      }.collect()
    val out = rows.sortBy(r => (r._1, r._2, r._3, r._4))
      .map(r => PageStat(r._1, r._2, r._3, r._4, r._5, r._6, r._7))
      .toIndexedSeq
    (out, rows.filter(_._8).map(_._1).distinct.length.toLong)
  }
}

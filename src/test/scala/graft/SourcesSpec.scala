package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** File-source scale properties (queries/Sources.scala). The oracle pins
  * round-trip VALUES; these pin the SCAN behavior that matters at 100 TB:
  * a filter on the partition column must prune directories before any
  * file is opened, not read-then-filter.
  */
class SourcesSpec extends SparkSpec {

  test("q64: lang filter prunes at the partition level (2 of 5 dirs scanned)") {
    val stage = Files.createTempDirectory("graft_psink_spec_")
    try {
      Graft.table(spark, "/root/testdata/sf0.001", "documents")
        .write.mode("overwrite").partitionBy("lang")
        .parquet(s"$stage/out")
      val read = spark.read.parquet(s"$stage/out")
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      // sparkPlan, not executedPlan: AQE wraps the tree and hides the scan
      val scans = read.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no file scan in plan")
      val scan = scans.head
      assert(scan.partitionFilters.nonEmpty,
        s"lang IN filter did not become a partition filter:\n${read.queryExecution.executedPlan}")
      // 5 langs on disk; only en + de directories may be selected
      assert(scan.selectedPartitions.partitionCount == 2,
        s"expected 2 pruned partitions, scanned ${scan.selectedPartitions.partitionCount}")
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(stage).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }

  test("q255 complement: without ignoreCorruptFiles the garbage " +
      "parquet fails the read loudly") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft_corrupt_spec_")
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$stage/out")
      Files.write(stage.resolve("out/zz_garbage.parquet"),
        Array.fill[Byte](256)(0x5a))
      // default (strict): the scan must surface the corruption
      val ex = intercept[org.apache.spark.SparkException] {
        spark.read.parquet(s"$stage/out").count()
      }
      assert(ex.getMessage != null)
      // lenient: exactly the good rows survive
      val n = spark.read.option("ignoreCorruptFiles", "true")
        .parquet(s"$stage/out").count()
      assert(n == 2L)
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("parquet footer bloom filters: present keys always hit, absent " +
      "keys mostly miss — the MEMBERSHIP data-skipping layer beside " +
      "q346's min/max zone maps (spec-only: DuckDB cannot replay the " +
      "bloom bytes)") {
    import scala.jdk.CollectionConverters._
    val stage = Files.createTempDirectory("graft_bloom_spec_")
    try {
      // keys ≡ 3 (mod 7); probes for ≡ 4 (mod 7) are disjoint by
      // construction, so any hit there is a bloom false positive
      spark.range(0, 5000)
        .select((col("id") * 7 + 3).as("doc_id"))
        .coalesce(1).write
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .parquet(s"$stage/out")
      val conf = spark.sessionState.newHadoopConf()
      val out = new org.apache.hadoop.fs.Path(s"$stage/out")
      val file = out.getFileSystem(conf).listStatus(out)
        .filter(_.getPath.getName.endsWith(".parquet")).head
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(file, conf))
      try {
        val block = rd.getFooter.getBlocks.asScala.head
        val cc = block.getColumns.asScala
          .find(_.getPath.toDotString == "doc_id").get
        val bloom = rd.getBloomFilterDataReader(block).readBloomFilter(cc)
        assert(bloom != null, "writer produced no footer bloom filter")
        val falseNegatives = (0L until 5000L).map(_ * 7 + 3)
          .count(v => !bloom.findHash(bloom.hash(v)))
        assert(falseNegatives == 0,
          s"bloom filters must never miss a present key: $falseNegatives")
        val falsePositives = (0L until 5000L).map(_ * 7 + 4)
          .count(v => bloom.findHash(bloom.hash(v)))
        assert(falsePositives < 250,
          s"absent-key hit rate far above the default fpp: $falsePositives/5000")
      } finally rd.close()
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("FooterManifest.probePages: parquet.page.row.count.limit with " +
      "per-row size checks yields exact k-row pages, aligned across " +
      "columns, with page min/max equal to a driver recompute") {
    val stage = Files.createTempDirectory("graft_pgidx_spec_")
    try {
      val n = 640L
      val k = 80L // 8 pages
      spark.range(0, n)
        .select(col("id").as("a"), (col("id") * 7 % 100).as("b"))
        .repartition(1).sortWithinPartitions(col("a"))
        .write
        .option("parquet.page.row.count.limit", k)
        .option("parquet.page.size.row.check.min", "1")
        .option("parquet.page.size.row.check.max", "1")
        .parquet(s"$stage/out")
      val paths = Option(new java.io.File(s"$stage/out").listFiles())
        .getOrElse(Array()).filter(_.getName.endsWith(".parquet"))
        .map(_.getPath).toSeq
      assert(paths.size == 1)
      val (pages, inTask) = graft.ops.FooterManifest.probePages(
        spark, paths, Seq("a", "b"))
      assert(inTask == 1L, "page-index IO ran outside a task")
      val byCol = pages.groupBy(_.col)
      assert(byCol.keySet == Set("a", "b"))
      // exact k-row page boundaries, identical across columns
      for (c <- Seq("a", "b")) {
        val ps = byCol(c).sortBy(_.page)
        assert(ps.size == 8, s"col $c: ${ps.size} pages, expected 8")
        assert(ps.map(_.firstRow) == (0 until 8).map(_ * k),
          s"col $c page boundaries drifted: ${ps.map(_.firstRow)}")
      }
      // page min/max equal the row_number-chunk model (rows sorted by a)
      val a = byCol("a").sortBy(_.page)
      assert(a.map(p => (p.lo, p.hi)) ==
        (0 until 8).map(i => (i * k, i * k + k - 1)))
      val b = byCol("b").sortBy(_.page)
      val expB = (0 until 8).map { i =>
        val vs = (i * k until i * k + k).map(_ * 7 % 100)
        (vs.min, vs.max)
      }
      assert(b.map(p => (p.lo, p.hi)) == expB)
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("FooterManifest.probe: every footer opens INSIDE a Spark task " +
      "(no per-file driver IO), and the distributed stats equal a " +
      "driver-side recompute") {
    import scala.jdk.CollectionConverters._
    val stage = Files.createTempDirectory("graft_fm_spec_")
    try {
      // 16 files, ukey scattered, blooms on — the q354/q356 layout
      val n = 1600L
      val k = n / 16
      spark.range(0, n)
        .select(col("id").as("event_id"),
          (pmod(col("id") * 2654435761L, lit(1000000007L)) * 1000L + 7L)
            .as("ukey"))
        .repartition(1).sortWithinPartitions(col("event_id"))
        .write.option("maxRecordsPerFile", k)
        .option("parquet.bloom.filter.enabled#ukey", "true")
        .parquet(s"$stage/out")
      val probes = Seq(7L, 1007L) // arbitrary members of the residue class
      val (footers, probedInTask) = graft.ops.FooterManifest.probe(
        spark, s"$stage/out", Seq("ukey", "event_id"), "ukey", probes)
      assert(footers.size == 16, s"expected 16 files, got ${footers.size}")
      // THE pin for VERDICT-r9 #1: each collected row records whether
      // TaskContext.get() != null when its footer opened, and the count
      // is DISTINCT PATHS over the job result (ADVICE-r10: retry-proof —
      // a retried task's rows replace its failed attempt's, unlike an
      // accumulator), so files-probed-in-task == files proves the
      // footer IO ran inside a Spark job, not a driver loop
      assert(probedInTask == 16L,
        s"footer IO ran outside tasks: $probedInTask of 16 in-task")
      // stats fidelity: driver-side recompute of one file's footer
      val conf = spark.sessionState.newHadoopConf()
      val f0 = footers.head
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f0.path), conf))
      try {
        val block = rd.getFooter.getBlocks.asScala.head
        def cc(c: String) = block.getColumns.asScala
          .find(_.getPath.toDotString == c).get
        def mn(c: String) = cc(c).getStatistics.genericGetMin
          .asInstanceOf[java.lang.Long].longValue
        def mx(c: String) = cc(c).getStatistics.genericGetMax
          .asInstanceOf[java.lang.Long].longValue
        assert(f0.blocks.head.lo == IndexedSeq(mn("ukey"), mn("event_id")))
        assert(f0.blocks.head.hi == IndexedSeq(mx("ukey"), mx("event_id")))
        val bloom = rd.getBloomFilterDataReader(block)
          .readBloomFilter(cc("ukey"))
        if (bloom != null)
          assert(f0.blocks.head.bloomHit == probes.map(v =>
            bloom.findHash(bloom.hash(v))).toIndexedSeq)
      } finally rd.close()
      // file-level range helper folds over blocks correctly
      val (lo, hi) = f0.range(1)
      assert(lo == 0L && hi == k - 1,
        s"event_id sorted layout: file 0 must span [0, ${k - 1}], got [$lo, $hi]")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("ManifestLookup amortization (VERDICT-r10 #1): a second lookup on " +
      "an unchanged layout opens ZERO parquet footers; an append probes " +
      "only the new files; kept scans equal full scans") {
    // The done-criterion for the manifest-amortized q356/q358 family:
    // footer IO happens once per file STATE (at manifest slice build),
    // never per lookup. footerOpenRequests counts every footer the
    // probe helpers are asked to open — suites run sequentially in the
    // forked test JVM, so snapshot diffs around the calls are exact.
    val stage = Files.createTempDirectory("graft_amort_")
    val nm = "specamort" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    def ukeyOf(id: Long): Long = (id * 2654435761L % 1000000007L) * 1000L + 7L
    def write(dir: String, lo: Long, hi: Long, nFiles: Long): Seq[String] = {
      val n = hi - lo
      spark.range(lo, hi)
        .select(col("id").as("event_id"),
          (pmod(col("id") * 2654435761L, lit(1000000007L)) * 1000L + 7L)
            .as("ukey"))
        .repartition(1).sortWithinPartitions(col("event_id"))
        .write.option("maxRecordsPerFile", (n + nFiles - 1) / nFiles)
        .option("parquet.bloom.filter.enabled#ukey", "true")
        .parquet(dir)
      Option(new java.io.File(dir).listFiles()).getOrElse(Array())
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq.sorted
    }
    try {
      val counter = graft.ops.FooterManifest.footerOpenRequests
      val baseFiles = write(s"$stage/base", 0, 1600, 8)
      assert(baseFiles.size == 8)
      // lookup 1: builds the 8 base slices — exactly 8 footer opens
      val t0 = counter.get
      val m1 = graft.ops.ManifestLookup.bloomManifest(
        spark, nm, "v1", baseFiles, "ukey")
      val kept1 = graft.ops.ManifestLookup.keptPaths(
        spark, m1, Seq(ukeyOf(7L)))
      assert(counter.get - t0 == 8L,
        s"manifest build should open exactly the 8 base footers, " +
          s"opened ${counter.get - t0}")
      assert(kept1.nonEmpty && kept1.toSet.subsetOf(baseFiles.toSet))
      // lookup 2, different probe, unchanged layout: ZERO footer opens
      val t1 = counter.get
      val m2 = graft.ops.ManifestLookup.bloomManifest(
        spark, nm, "v1", baseFiles, "ukey")
      val kept2 = graft.ops.ManifestLookup.keptPaths(
        spark, m2, Seq(ukeyOf(1234L)))
      assert(counter.get == t1,
        s"unchanged layout reopened ${counter.get - t1} footers")
      assert(kept2.nonEmpty)
      // append 4 delta files: only THEY are probed (base slices served)
      val deltaFiles = write(s"$stage/delta", 1600, 2000, 4)
      assert(deltaFiles.size == 4)
      val t2 = counter.get
      val m3 = graft.ops.ManifestLookup.bloomManifest(
        spark, nm, "v1", baseFiles ++ deltaFiles, "ukey")
      val deltaProbe = ukeyOf(1700L)
      val kept3 = graft.ops.ManifestLookup.keptPaths(
        spark, m3, Seq(deltaProbe))
      assert(counter.get - t2 == 4L,
        s"append should probe only the 4 new footers, " +
          s"probed ${counter.get - t2}")
      assert(kept3.nonEmpty)
      // correctness: the kept-path scan equals the full scan
      val pruned = spark.read.parquet(kept3: _*)
        .filter(col("ukey") === deltaProbe).select(col("event_id"))
        .collect().map(_.getLong(0)).sorted
      val full = spark.read.parquet((baseFiles ++ deltaFiles): _*)
        .filter(col("ukey") === deltaProbe).select(col("event_id"))
        .collect().map(_.getLong(0)).sorted
      assert(pruned.sameElements(full) && full.contains(1700L),
        s"pruned ${pruned.toList} != full ${full.toList}")
      // a probe-SET lookup (the q358 shape) unions per-probe kept sets
      val keptSet = graft.ops.ManifestLookup.keptPaths(
        spark, m3, Seq(ukeyOf(7L), deltaProbe))
      assert(kept1.forall(keptSet.contains) && kept3.forall(keptSet.contains))
      assert(counter.get - t2 == 4L, "probe-set lookup reopened footers")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("ManifestDataSource (DSv2, VERDICT-r10 #2): plain SQL WHERE on " +
      "the key column prunes files via the staged manifest — pushed " +
      "filters recorded, kept subset of total, zero footer reopens on " +
      "repeat lookups, rows equal the full scan, ReadSchema pruned") {
    import graft.sources.ManifestDataSource
    val stage = Files.createTempDirectory("graft_dsv2m_")
    val nm = "specdsv2" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    def ukeyOf(id: Long): Long = (id * 2654435761L % 1000000007L) * 1000L + 7L
    try {
      // layout sorted BY the key: zone ranges are disjoint, so both
      // the bloom (equality) and zone (range) pruning paths exercise
      spark.range(0, 1600)
        .select(col("id").as("event_id"),
          (pmod(col("id") * 2654435761L, lit(1000000007L)) * 1000L + 7L)
            .as("ukey"))
        .repartition(1).sortWithinPartitions(col("ukey"))
        .write.option("maxRecordsPerFile", 200)
        .option("parquet.bloom.filter.enabled#ukey", "true")
        .parquet(s"$stage/out")
      spark.read.format("graft.sources.ManifestDataSource")
        .option("layoutDirs", s"$stage/out")
        .option("keyColumn", "ukey")
        .option("manifestName", nm)
        .load().createOrReplaceTempView("dsv2m_events")
      val counter = graft.ops.FooterManifest.footerOpenRequests
      val probe = ukeyOf(7L)
      val o = ManifestDataSource.observed(nm)
      // first lookup: builds the 8 manifest slices, then prunes
      val r1 = spark.sql(
        s"SELECT event_id, ukey FROM dsv2m_events WHERE ukey = $probe")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(r1.map(_._1).sameElements(Array(7L)), s"got ${r1.toList}")
      assert(o.pushed.nonEmpty,
        "the WHERE never reached the scan builder")
      assert(o.totalFiles == 8)
      assert(o.keptFiles.size < 8 && o.keptFiles.nonEmpty,
        s"no file pruning: kept ${o.keptFiles.size} of 8")
      // repeat lookup (different probe): ZERO footer opens — the SQL
      // surface amortizes exactly like the Scala one
      val t0 = counter.get
      val r2 = spark.sql(
        s"SELECT event_id FROM dsv2m_events WHERE ukey = ${ukeyOf(1234L)}")
        .collect().map(_.getLong(0))
      assert(r2.sameElements(Array(1234L)))
      assert(counter.get == t0,
        s"repeat SQL lookup reopened ${counter.get - t0} footers")
      // range predicate prunes on zone maps (layout is key-sorted)
      val allKeys = spark.read.parquet(s"$stage/out")
        .select(col("ukey")).collect().map(_.getLong(0)).sorted
      val (rlo, rhi) = (allKeys(100), allKeys(180)) // inside file 0
      val rr = spark.sql("SELECT event_id FROM dsv2m_events " +
        s"WHERE ukey >= $rlo AND ukey <= $rhi")
        .collect().map(_.getLong(0)).sorted
      val rrExpect = spark.read.parquet(s"$stage/out")
        .filter(col("ukey").between(rlo, rhi))
        .select(col("event_id")).collect().map(_.getLong(0)).sorted
      assert(rr.sameElements(rrExpect) && rr.length == 81)
      assert(o.keptFiles.size <= 2,
        s"zone range kept ${o.keptFiles.size} of 8")
      // non-key predicate: no file pruning, rows still exact (residual
      // evaluation is Spark's)
      val nk = spark.sql(
        "SELECT event_id FROM dsv2m_events WHERE event_id < 5")
        .collect().map(_.getLong(0)).sorted
      assert(nk.sameElements(0L until 5L))
      assert(o.keptFiles.size == 8,
        "a non-key predicate must not prune files")
      // column pruning reaches the scan (SupportsPushDownRequiredColumns):
      // a projection without residual-filter needs reads ONE column
      val pr = spark.sql("SELECT SUM(event_id) AS s FROM dsv2m_events")
      assert(pr.collect().head.getLong(0) == 1599L * 1600L / 2L)
      // sparkPlan, not executedPlan: AQE wraps the tree (q64 test note)
      val scan = pr.queryExecution.sparkPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scan.nonEmpty, "no BatchScanExec in the executed plan")
      assert(scan.get.scan.readSchema().fieldNames.toSeq == Seq("event_id"),
        s"ReadSchema not pruned: ${scan.get.scan.readSchema().fieldNames.toSeq}")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("ManifestScan runtime filtering (DPP, VERDICT-r11 #1): a join " +
      "whose ONLY key predicate lives on the dim side re-prunes kept " +
      "files at runtime from the build side's key set; result equals " +
      "the unfiltered join") {
    import graft.sources.ManifestDataSource
    val stage = Files.createTempDirectory("graft_dpp_")
    val nm = "specdpp" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      // key-sorted 8-file layout with footer blooms on ukey
      spark.range(0, 1600)
        .select(col("id").as("event_id"),
          (pmod(col("id") * 2654435761L, lit(1000000007L)) * 1000L + 7L)
            .as("ukey"))
        .repartition(1).sortWithinPartitions(col("ukey"))
        .write.option("maxRecordsPerFile", 200)
        .option("parquet.bloom.filter.enabled#ukey", "true")
        .parquet(s"$stage/out")
      // small dim: 4 keys, the selective predicate ONLY on the dim side
      spark.range(0, 1600).filter(pmod(col("id"), lit(400)) === 7)
        .select(
          (pmod(col("id") * 2654435761L, lit(1000000007L)) * 1000L + 7L)
            .as("d_ukey"),
          lit(1L).as("sel"))
        .write.parquet(s"$stage/dim")
      spark.read.format("graft.sources.ManifestDataSource")
        .option("layoutDirs", s"$stage/out")
        .option("keyColumn", "ukey")
        .option("manifestName", nm)
        .load().createOrReplaceTempView("dpp_fact")
      spark.read.parquet(s"$stage/dim").createOrReplaceTempView("dpp_dim")
      val o = ManifestDataSource.observed(nm)
      o.resetRuntime()
      val q = "SELECT f.event_id, f.ukey FROM dpp_fact f " +
        "JOIN dpp_dim d ON f.ukey = d.d_ukey WHERE d.sel = 1"
      val got = spark.sql(q)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = spark.read.parquet(s"$stage/out")
        .join(spark.read.parquet(s"$stage/dim").filter(col("sel") === 1),
          col("ukey") === col("d_ukey"))
        .select(col("event_id"), col("ukey"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.sameElements(want) && got.length == 4,
        s"DPP join rows ${got.toList} != ${want.toList}")
      assert(o.runtimeFilters.nonEmpty,
        "no runtime filter reached ManifestScan.filter — DPP never fired")
      val keptR = o.runtimeKeptFiles
      assert(keptR.nonEmpty && keptR.size < 8,
        s"runtime filtering kept ${keptR.size} of 8 files — no re-prune")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("ManifestScan comparison pruning accepts Integer literals " +
      "(VERDICT-r11 #7) and short-circuits sentinel strict bounds " +
      "(ADVICE-r11) instead of wrapping") {
    import graft.sources.ManifestDataSource
    val stage = Files.createTempDirectory("graft_intlit_")
    val nm = "specint" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      // event_id-sorted layout, keyColumn = event_id: int-literal
      // ranges in SQL stay IntegerType, exercising the widened arms
      spark.range(0, 1600)
        .select(col("id").as("event_id"), (col("id") * 3L).as("v"))
        .repartition(1).sortWithinPartitions(col("event_id"))
        .write.option("maxRecordsPerFile", 200)
        .option("parquet.bloom.filter.enabled#event_id", "true")
        .parquet(s"$stage/out")
      spark.read.format("graft.sources.ManifestDataSource")
        .option("layoutDirs", s"$stage/out")
        .option("keyColumn", "event_id")
        .option("manifestName", nm)
        .load().createOrReplaceTempView("intlit_events")
      // 100 < event_id <= 180: an INT-literal range (no L suffix) —
      // must prune to file 0 only, rows exact
      val o = ManifestDataSource.observed(nm)
      val r = spark.sql("SELECT v FROM intlit_events " +
        "WHERE event_id > 100 AND event_id <= 180")
        .collect().map(_.getLong(0)).sorted
      assert(r.sameElements((101L to 180L).map(_ * 3L)))
      assert(o.keptFiles.size == 1,
        s"int-literal range kept ${o.keptFiles.size} " +
          "of 8 files — the Integer arms did not prune")
      // strict bound past the extreme: provably empty, kept = 0 files
      // (the +1 previously wrapped to Long.MinValue = keep everything)
      val e = spark.sql(
        s"SELECT v FROM intlit_events WHERE event_id > ${Long.MaxValue}L")
        .collect()
      assert(e.isEmpty)
      assert(o.keptFiles.isEmpty,
        s"GreaterThan(Long.MaxValue) kept ${o.keptFiles.size} files")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("bloomManifest cold build is batched (VERDICT-r11 #2): an N-file " +
      "cold build runs O(1) Spark jobs (one distributed probe + one bulk " +
      "slice write), not O(N), and batch-published slices serve byte-" +
      "equal rows to per-dep builds") {
    val stage = Files.createTempDirectory("graft_batch_")
    val nm = "specbatch" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      val n = 12 // below compactEvery=16: no fold job in the count
      spark.range(0, 2400)
        .select(col("id").as("event_id"),
          (pmod(col("id") * 2654435761L, lit(1000000007L)) * 1000L + 7L)
            .as("ukey"))
        .repartition(1).sortWithinPartitions(col("ukey"))
        .write.option("maxRecordsPerFile", 200)
        .option("parquet.bloom.filter.enabled#ukey", "true")
        .parquet(s"$stage/out")
      val files = Option(new java.io.File(s"$stage/out").listFiles())
        .getOrElse(Array()).filter(_.getName.endsWith(".parquet"))
        .map(_.getPath).toSeq.sorted
      assert(files.size == n, s"expected $n files, got ${files.size}")
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val counter = graft.ops.FooterManifest.footerOpenRequests
        val t0 = counter.get
        val m = graft.ops.ManifestLookup.bloomManifest(
          spark, nm, "v1", files, "ukey")
        m.count() // materialize the serve too
        // ADVICE-r12: poll the listener queue to quiescence instead of
        // a fixed sleep, and assert the RATIO to the per-file floor
        // instead of an absolute count — the measured set includes
        // serve-side read jobs, so incidental extra jobs from scheduler
        // timing or unrelated plan changes must not flake the pin.
        var last = -1
        var stableFor = 0
        val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
        while (stableFor < 3 && System.nanoTime < deadline) {
          Thread.sleep(100)
          val j = jobs.get
          if (j == last) stableFor += 1 else { stableFor = 0; last = j }
        }
        assert(counter.get - t0 == n.toLong,
          s"cold build opened ${counter.get - t0} footers, want $n")
        // the per-file loop cost ≥2 jobs per file (probe + slice write)
        // = ≥2N; the batched path is O(1) builds plus a few serve-side
        // reads — anything below N (= half the per-file floor) proves
        // the batch ran
        assert(jobs.get < n,
          s"cold build of $n files ran ${jobs.get} Spark jobs " +
            s"(per-file floor ~${2 * n}) — the per-file loop is back")
      } finally spark.sparkContext.removeSparkListener(listener)
      // read-equivalence: a second manifest over the same layout built
      // WITHOUT the prepass (per-dep path) serves identical rows
      val m1 = graft.ops.ManifestLookup.bloomManifest(
        spark, nm, "v1", files, "ukey")
      val nm2 = nm + "x"
      val m2 = graft.ops.Staged.deltaRelation(
        spark, nm2, "v1-ukey", files, compactEvery = 16) { f =>
        val (rows, _) = graft.ops.FooterManifest.probeBloomBytes(
          spark, Seq(f), "ukey")
        import spark.implicits._
        rows.toDF("path", "block", "lo", "hi", "bloom")
      }
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("path"), col("block"), col("lo"), col("hi"),
          md5(col("bloom")).as("bh"))
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(canon(m1).sameElements(canon(m2)),
        "batch-published slices differ from per-dep builds")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("ManifestDataSource STRING keys (VERDICT-r12 #1): equality and " +
      "IN on a string key column prune files via binary zone bounds + " +
      "blooms; repeat lookups open zero footers; rows equal the full " +
      "scan; a string range predicate does NOT prune but stays exact") {
    import graft.sources.ManifestDataSource
    val stage = Files.createTempDirectory("graft_strkey_")
    val nm = "specstr" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      // 1600 docs keyed by a 16-hex md5 fingerprint, sorted by the key
      // into 8 exact chunks with footer blooms — the content-hash
      // layout; file key ranges partition the hash space, so an
      // equality probe lands in exactly one file's zone range
      spark.range(0, 1600)
        .select(col("id").as("doc_id"),
          substring(md5(col("id").cast("string")), 1, 16).as("skey"))
        .repartition(1).sortWithinPartitions(col("skey"))
        .write.option("maxRecordsPerFile", 200)
        .option("parquet.bloom.filter.enabled#skey", "true")
        .parquet(s"$stage/out")
      def skeyOf(id: Long): String = spark.range(id, id + 1)
        .select(substring(md5(col("id").cast("string")), 1, 16))
        .head.getString(0)
      spark.read.format("graft.sources.ManifestDataSource")
        .option("layoutDirs", s"$stage/out")
        .option("keyColumn", "skey")
        .option("manifestName", nm)
        .load().createOrReplaceTempView("strkey_docs")
      val counter = graft.ops.FooterManifest.footerOpenRequests
      val o = ManifestDataSource.observed(nm)
      // equality: exactly the probe's row, pruned to < 8 files
      val r1 = spark.sql("SELECT doc_id FROM strkey_docs " +
        s"WHERE skey = '${skeyOf(7L)}'").collect().map(_.getLong(0))
      assert(r1.sameElements(Array(7L)), s"got ${r1.toList}")
      assert(o.pushed.nonEmpty, "string equality never reached the scan")
      assert(o.totalFiles == 8)
      assert(o.keptFiles.nonEmpty && o.keptFiles.size < 8,
        s"string equality kept ${o.keptFiles.size} of 8 files")
      // IN(3): union of three probes' files, still pruned
      val probes = Seq(100L, 900L, 1500L).map(skeyOf)
      val t0 = counter.get
      val r2 = spark.sql("SELECT doc_id FROM strkey_docs WHERE skey IN (" +
        probes.map(p => s"'$p'").mkString(",") + ")")
        .collect().map(_.getLong(0)).sorted
      assert(r2.sameElements(Array(100L, 900L, 1500L)), s"got ${r2.toList}")
      assert(o.keptFiles.size <= 3 && o.keptFiles.nonEmpty,
        s"IN(3) kept ${o.keptFiles.size} of 8 files")
      // the repeat lookup served from staged manifest slices: zero
      // footer reopens — the amortization contract, string-typed
      assert(counter.get == t0,
        s"repeat string lookup reopened ${counter.get - t0} footers")
      // rows equal the full scan for a broad predicate that does NOT
      // prune (string comparison is not a pruning shape): correctness
      // never rides on pruning
      val half = spark.sql("SELECT COUNT(*) AS n FROM strkey_docs " +
        "WHERE skey >= '8'").head.getLong(0)
      val halfWant = spark.read.parquet(s"$stage/out")
        .filter(col("skey") >= "8").count()
      assert(half == halfWant, s"range rows $half != $halfWant")
      assert(o.keptFiles.size == 8,
        "a string comparison must not prune (not a supported shape)")
      // unfiltered COUNT(*) prunes the projection to ZERO columns —
      // the read support's first-column fallback must still count rows
      val all = spark.sql("SELECT COUNT(*) AS n FROM strkey_docs")
        .head.getLong(0)
      assert(all == 1600L, s"empty-projection count got $all")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("ManifestScan STRING runtime filtering (VERDICT-r12 #1 DPP " +
      "variant): a join whose only key predicate lives on the dim side " +
      "re-prunes kept files at runtime from string probes") {
    import graft.sources.ManifestDataSource
    val stage = Files.createTempDirectory("graft_strdpp_")
    val nm = "specsdpp" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      spark.range(0, 1600)
        .select(col("id").as("doc_id"),
          substring(md5(col("id").cast("string")), 1, 16).as("skey"))
        .repartition(1).sortWithinPartitions(col("skey"))
        .write.option("maxRecordsPerFile", 200)
        .option("parquet.bloom.filter.enabled#skey", "true")
        .parquet(s"$stage/out")
      // 4 dim keys; the selective predicate ONLY on the dim side
      spark.range(0, 1600).filter(pmod(col("id"), lit(400)) === 7)
        .select(substring(md5(col("id").cast("string")), 1, 16)
          .as("d_skey"), lit(1L).as("sel"))
        .write.parquet(s"$stage/dim")
      spark.read.format("graft.sources.ManifestDataSource")
        .option("layoutDirs", s"$stage/out")
        .option("keyColumn", "skey")
        .option("manifestName", nm)
        .load().createOrReplaceTempView("sdpp_fact")
      spark.read.parquet(s"$stage/dim").createOrReplaceTempView("sdpp_dim2")
      val o = ManifestDataSource.observed(nm)
      o.resetRuntime()
      val got = spark.sql("SELECT f.doc_id, f.skey FROM sdpp_fact f " +
        "JOIN sdpp_dim2 d ON f.skey = d.d_skey WHERE d.sel = 1")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      val want = spark.read.parquet(s"$stage/out")
        .join(spark.read.parquet(s"$stage/dim").filter(col("sel") === 1),
          col("skey") === col("d_skey"))
        .select(col("doc_id"), col("skey"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(got.sameElements(want) && got.length == 4,
        s"string DPP rows ${got.toList} != ${want.toList}")
      assert(o.runtimeFilters.nonEmpty,
        "no runtime filter reached ManifestScan.filter — string DPP " +
          "never fired")
      assert(o.runtimeKeptFiles.nonEmpty && o.runtimeKeptFiles.size < 8,
        s"runtime kept ${o.runtimeKeptFiles.size} of 8 — no re-prune")
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("prepublishSlices 16-hex batch key (VERDICT-r12 #3): two deps " +
      "whose 8-hex fingerprints collide but 16-hex differ are BOTH " +
      "batch-published (previously demoted to the per-dep path)") {
    val stage = Files.createTempDirectory("graft_hex16_")
    val nm = "spechex" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      // birthday-search file PATHS whose md5_8 collide: ~2^16 tries
      val seen = scala.collection.mutable.Map[String, String]()
      var pair: Option[(String, String)] = None
      var i = 0
      while (pair.isEmpty) {
        val cand = s"$stage/in/f$i.parquet"
        val h = Graft.md5_8(cand)
        seen.get(h) match {
          case Some(prev) if prev != cand => pair = Some((prev, cand))
          case _ => seen(h) = cand
        }
        i += 1
      }
      val (depA, depB) = pair.get
      assert(Graft.md5_8(depA) == Graft.md5_8(depB))
      assert(Graft.md5_16(depA) != Graft.md5_16(depB),
        "16-hex also collides — the widened key cannot batch this pair " +
          "(astronomically unlikely; regenerate the search)")
      import spark.implicits._
      Files.createDirectories(java.nio.file.Paths.get(s"$stage/in"))
      for (p <- Seq(depA, depB))
        Seq((p, 1L)).toDF("src", "v").coalesce(1)
          .write.mode("overwrite").parquet(p)
      graft.ops.Staged.prepublishSlices(spark, nm, "v1",
          Seq(depA, depB)) { missing =>
        // the widened key must batch BOTH deps (under 8-hex grouping
        // the collision excluded them from `missing` entirely)
        assert(missing.toSet == Set(depA, depB),
          s"collision pair not batched: $missing")
        missing.map(p => (p, 1L)).toDF("__dep", "v")
      }
      for (p <- Seq(depA, depB)) {
        val sp = graft.ops.Staged.slicePath(nm, "v1", p)
        assert(Files.exists(sp.resolve("_SUCCESS")),
          s"slice for $p not batch-published at $sp")
        val rows = spark.read.parquet(sp.toString).collect()
        assert(rows.length == 1 && rows.head.getLong(0) == 1L)
      }
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("deltaRelation sweeps crashed .slicebatch_ temp dirs past the " +
      "TTL (ADVICE-r12) without touching live slices") {
    val stage = Files.createTempDirectory("graft_sbsweep_")
    val nm = "specsweep" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      import spark.implicits._
      val dep = s"$stage/d.parquet"
      Seq((1L, "a")).toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(dep)
      val root = java.nio.file.Paths.get("/tmp/graft_stage")
      Files.createDirectories(root)
      // a crashed batch prepass orphan, aged past the 6 h TTL
      val orphan = root.resolve(s"$nm.slicebatch_123456789")
      Files.createDirectories(orphan)
      Files.setLastModifiedTime(orphan,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7L * 3600 * 1000))
      // a FRESH orphan must survive (same-session builds in flight)
      val fresh = root.resolve(s"$nm.slicebatch_987654321")
      Files.createDirectories(fresh)
      val served = graft.ops.Staged.deltaRelation(spark, nm, "v1",
        Seq(dep))(d => spark.read.parquet(d))
      assert(served.count() == 1L)
      assert(!Files.exists(orphan),
        "aged .slicebatch_ orphan survived the serve sweep")
      assert(Files.exists(fresh),
        "the TTL gate must protect fresh batch dirs")
      // the live slice itself is intact
      val sp = graft.ops.Staged.slicePath(nm, "v1", dep)
      assert(Files.exists(sp.resolve("_SUCCESS")))
      Files.deleteIfExists(fresh)
    } finally graft.Graft.deleteRecursively(stage)
  }

  test("collectCapped / materializeCollected enforce the 10k driver bound " +
    "(r14, VERDICT-r13 #2): an over-cap leg throws instead of ballooning") {
    import spark.implicits._
    val wide = spark.range(0, 50).toDF("k")
    // under the cap: the limit is a no-op — every row comes back
    val ok = graft.queries.Sources.collectCapped("spec_ok", wide, maxRows = 50)
    assert(ok.length == 50)
    val e1 = intercept[IllegalArgumentException] {
      graft.queries.Sources.collectCapped("spec_over", wide, maxRows = 49)
    }
    assert(e1.getMessage.contains("exceeds 49 rows"))
    val rows = (1 to 10).map(i => org.apache.spark.sql.Row(i.toLong))
    val e2 = intercept[IllegalArgumentException] {
      graft.queries.Sources.materializeCollected(spark, "spec_mc",
        spark.range(0, 10).toDF("k"), rows, maxRows = 9)
    }
    assert(e2.getMessage.contains("exceeds 9 rows"))
  }
}

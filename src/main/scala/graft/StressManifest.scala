package graft

import org.apache.spark.sql.functions._

/** FILE-COUNT stress for the staging/manifest family (r13, VERDICT-r12
  * #5): the ~sf1 harness stresses data VOLUME, but the manifest path's
  * scale axis is the number of files — the 10⁶-file layouts the batched
  * cold build and the LSM slice compaction exist for. This main builds
  * a ≥10³-file bloom layout, runs the full manifest protocol against
  * it, and pins the scale contracts the unit specs pin at 12 files:
  *
  *  - the COLD build runs O(1) Spark jobs (SparkListener count ≪ the
  *    ~2N per-file floor) and opens exactly N footers;
  *  - the SERVE after compaction reads a BOUNDED number of slice legs:
  *    ≤ compactEvery tail slices + 1 compacted stage, not N dirs;
  *  - a REPEAT lookup opens ZERO footers (amortization holds at 10³);
  *  - the kept-file scan equals the full scan on a probe (correctness
  *    never rides on pruning), and equality probes keep ≪ N files.
  *
  * Emits ONE JSON line `{"family":"manifest_filecount",...,"ok":bool}`
  * for tools/stress.py to fold into STRESS_r{N}.json.
  */
object StressManifest {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val spark = Graft.session()
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_smanifest_")
    val nm = "stressmanifest" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      // n files x 200 rows, key-sorted so zone ranges partition the
      // keyspace; footer blooms on the scattered ukey
      val rows = n.toLong * 200
      spark.range(0, rows)
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
      val nFiles = files.size
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      def ukeyOf(id: Long): Long = (id * 2654435761L % 1000000007L) * 1000L + 7L
      val counter = graft.ops.FooterManifest.footerOpenRequests
      spark.sparkContext.addSparkListener(listener)
      val (coldJobs, coldFooters, serveLegs, m) = try {
        val t0 = counter.get
        val m = graft.ops.ManifestLookup.bloomManifest(
          spark, nm, "v1", files, "ukey")
        m.count() // materialize the serve (compaction fold included)
        // drain queued listener events to a stable count
        var last = -1; var stableFor = 0
        val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
        while (stableFor < 3 && System.nanoTime < deadline) {
          Thread.sleep(200)
          val j = jobs.get
          if (j == last) stableFor += 1 else { stableFor = 0; last = j }
        }
        // serve legs: distinct slice/compact DIRS feeding the serve —
        // the read-amplification bound the LSM fold exists for
        val legs = m.inputFiles
          .map(f => new java.io.File(new java.net.URI(f).getPath)
            .getParentFile.getName)
          .distinct.length
        (jobs.get, counter.get - t0, legs, m)
      } finally spark.sparkContext.removeSparkListener(listener)
      // repeat lookup on the unchanged layout: zero footer opens
      val t1 = counter.get
      val m2 = graft.ops.ManifestLookup.bloomManifest(
        spark, nm, "v1", files, "ukey")
      val probe = ukeyOf(rows / 3)
      val kept = graft.ops.ManifestLookup.keptPaths(spark, m2, Seq(probe))
      val repeatFooters = counter.get - t1
      // correctness: kept scan equals full scan
      val prunedRows = spark.read.parquet(kept: _*)
        .filter(col("ukey") === probe).select(col("event_id"))
        .collect().map(_.getLong(0)).sorted
      val fullRows = spark.read.parquet(s"$stage/out")
        .filter(col("ukey") === probe).select(col("event_id"))
        .collect().map(_.getLong(0)).sorted
      val checks = Map(
        "n_files_built" -> (nFiles >= n),
        // O(1) build: ≤ 10 % of the ~2N per-file job floor
        "cold_jobs_o1" -> (coldJobs <= math.max(20, nFiles / 10)),
        "cold_footers_exact" -> (coldFooters == nFiles.toLong),
        // ≤ compactEvery tail slices + 1 compacted stage
        "serve_legs_bounded" -> (serveLegs <= 17),
        "repeat_zero_footers" -> (repeatFooters == 0L),
        "kept_far_below_total" -> (kept.nonEmpty && kept.size <= 8),
        "pruned_eq_full" -> (prunedRows.sameElements(fullRows) &&
          fullRows.nonEmpty))
      val ok = checks.values.forall(identity)
      println(s"""{"family":"manifest_filecount","n_files":$nFiles,""" +
        s""""cold_jobs":$coldJobs,"cold_footers":$coldFooters,""" +
        s""""serve_legs":$serveLegs,"repeat_footers":$repeatFooters,""" +
        s""""kept":${kept.size},""" +
        checks.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
          .mkString(",") + s""","ok":$ok}""")
      if (!ok) sys.exit(1)
    } finally {
      Graft.deleteRecursively(stage)
      spark.stop()
    }
  }
}

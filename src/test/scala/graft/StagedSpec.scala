package graft

import org.apache.spark.sql.functions._

/** ops.Staged protocol (r9 hardening) + planScrub v4 sensitivity.
  * The r8 ADVICE items these pin:
  *  - the stage key must incorporate a code-version token, so editing
  *    a builder plan can never be served a stale pre-edit stage;
  *  - stagePath is the spec-visible resolver (no /tmp mtime scans);
  *  - planScrub must DISTINGUISH operator flips (`>` vs `<=`, `+` vs
  *    `-`) while staying invariant under commutative operand reorder
  *    (the per-JVM Canonicalize hashCode ordering, r8's v3 rationale).
  */
class StagedSpec extends SparkSpec {
  import ops.Staged

  private val dep = "/root/testdata/sf0.001/nation.parquet"

  test("stagePath: same (name, version, deps) is stable; version bump " +
      "or dep change moves the path") {
    val p1 = Staged.stagePath("spec_rel", "v1", Seq(dep))
    assert(p1 == Staged.stagePath("spec_rel", "v1", Seq(dep)))
    assert(p1 != Staged.stagePath("spec_rel", "v2", Seq(dep)))
    assert(p1 != Staged.stagePath("spec_rel", "v1",
      Seq("/root/testdata/sf0.001/region.parquet")))
    assert(p1.toString.startsWith(Staged.root + "/spec_rel_"))
  }

  test("relation: builds once per (version, input-state), rebuilds on a " +
      "version bump, and a published dir survives the re-entry") {
    var builds = 0
    def build() = { builds += 1; spark.range(5).toDF("n") }
    // /tmp stages persist across test runs — clear THIS test's keys so
    // the build-count assertions see a cold start every run
    Seq("v1", "v2").foreach(v =>
      Graft.deleteRecursively(Staged.stagePath("spec_build", v, Seq(dep))))
    val r1 = Staged.relation(spark, "spec_build", "v1", Seq(dep))(build())
    assert(r1.count() == 5 && builds == 1)
    val p = Staged.stagePath("spec_build", "v1", Seq(dep))
    assert(java.nio.file.Files.exists(p.resolve("_SUCCESS")))
    val t0 = p.toFile.lastModified
    // second consumer: served from the stage, no rebuild, dir untouched
    val r2 = Staged.relation(spark, "spec_build", "v1", Seq(dep))(build())
    assert(r2.count() == 5 && builds == 1)
    assert(p.toFile.lastModified == t0)
    // version bump = new key = fresh build; v1's dir is NOT deleted
    // in-line (prune is TTL-gated), so a reader of the old stage is safe
    Staged.relation(spark, "spec_build", "v2", Seq(dep))(build()).count()
    assert(builds == 2)
    assert(java.nio.file.Files.exists(p.resolve("_SUCCESS")))
  }

  test("staged ANN graph (second Staged adopter): staged parquet " +
      "bit-equals the fresh plan and the second consumer reuses it") {
    val d = "/root/testdata/sf0.001"
    val p = queries.Ext.annGraphStagePath(d)
    Graft.deleteRecursively(p)
    // first consumer builds the stage inside its own plan construction
    val viaStage = queries.Ext.annGraph(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(java.nio.file.Files.exists(p.resolve("_SUCCESS")))
    val t0 = p.toFile.lastModified
    val fresh = queries.Ext.buildAnnGraph(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStage == fresh, "staged ANN graph diverged from the plan")
    assert(viaStage.nonEmpty)
    // second consumer: must read the stage, not rebuild it
    queries.Ext.annGraph(spark, d).count()
    assert(p.toFile.lastModified == t0,
      "second ANN consumer rebuilt the stage instead of reusing it")
  }

  test("deltaRelation: an appended dep builds only its slice, a " +
      "regenerated dep rebuilds only its slice, untouched slices are " +
      "never rewritten, and the union equals the direct build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_spec_")
    try {
      val a = dir.resolve("a.parquet").toString
      val b = dir.resolve("b.parquet").toString
      spark.range(0, 10).toDF("n").write.parquet(a)
      spark.range(10, 15).toDF("n").write.parquet(b)
      var builds = 0
      def build(dep: String) = {
        builds += 1
        spark.read.parquet(dep).withColumn("sq", col("n") * col("n"))
      }
      val r1 = Staged.deltaRelation(spark, "spec_delta", "v1", Seq(a))(build)
      assert(r1.count() == 10 && builds == 1)
      val pa = Staged.slicePath("spec_delta", "v1", a)
      assert(java.nio.file.Files.exists(pa.resolve("_SUCCESS")))
      val ta = pa.toFile.lastModified
      // appended dep: only the new slice builds; a's dir untouched
      val r2 = Staged.deltaRelation(spark, "spec_delta", "v1",
        Seq(a, b))(build)
      assert(r2.count() == 15 && builds == 2)
      assert(pa.toFile.lastModified == ta,
        "appending a dep rewrote an untouched slice")
      // regenerated dep: b re-keys and rebuilds; a still untouched
      spark.range(10, 18).toDF("n")
        .write.mode("overwrite").parquet(b)
      val r3 = Staged.deltaRelation(spark, "spec_delta", "v1",
        Seq(a, b))(build)
      assert(r3.count() == 18 && builds == 3)
      assert(pa.toFile.lastModified == ta,
        "regenerating a sibling rewrote an untouched slice")
      // union-of-slices ≡ direct build (per-row map commutes with union)
      val direct = spark.read.parquet(a, b)
        .withColumn("sq", col("n") * col("n"))
      assert(r3.exceptAll(direct).isEmpty && direct.exceptAll(r3).isEmpty)
    } finally Graft.deleteRecursively(dir)
  }

  test("deltaRelation compaction (VERDICT-r10 #6): the stable prefix " +
      "folds into ONE atomically-published stage, reads stay equivalent " +
      "pre/post fold and across prefix growth, folded-away slices sweep " +
      "only past the TTL gate, live tail slices survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cpt_spec_")
    val nm = "speccpt" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    try {
      val deps = (0 until 10).map { i =>
        val p = dir.resolve(s"d$i.parquet").toString
        spark.range(i * 10, i * 10 + 10).toDF("n").write.parquet(p)
        p
      }
      var builds = 0
      def build(dep: String) = {
        builds += 1
        spark.read.parquet(dep).withColumn("sq", col("n") * col("n"))
      }
      // 10 deps, fold unit 4 → prefix 8 folds, 2 tail slices live
      val r1 = Staged.deltaRelation(spark, nm, "v1", deps,
        compactEvery = 4)(build)
      assert(builds == 10, "each dep's slice builds exactly once")
      val cpt8 = Staged.compactPath(nm, "v1", deps.take(8))
      assert(java.nio.file.Files.exists(cpt8.resolve("_SUCCESS")),
        "prefix fold not published")
      // no partial fold can ever be visible: the only publish path is
      // ATOMIC_MOVE of a dir that already carries _SUCCESS; assert no
      // in-flight .build_ leftovers either
      val leftovers = Option(new java.io.File(Staged.root).listFiles())
        .getOrElse(Array())
        .filter(f => f.getName.startsWith(nm) &&
          f.getName.contains(".build_"))
      assert(leftovers.isEmpty, s"partial folds on disk: ${leftovers.toList}")
      // read-equivalence vs the unfolded form
      val direct = spark.read.parquet(deps: _*)
        .withColumn("sq", col("n") * col("n"))
      assert(r1.exceptAll(direct).isEmpty && direct.exceptAll(r1).isEmpty)
      // serving again rebuilds nothing (compacted + live slices served)
      val r2 = Staged.deltaRelation(spark, nm, "v1", deps,
        compactEvery = 4)(build)
      assert(builds == 10, "a re-serve rebuilt state")
      assert(r2.count() == 100)
      // folded-away slices: still on disk (young), swept once aged past
      // the 6h TTL by the next serve; tail slices stay
      val folded = Staged.slicePath(nm, "v1", deps.head)
      val tailSlice = Staged.slicePath(nm, "v1", deps.last)
      assert(java.nio.file.Files.exists(folded),
        "TTL gate ignored: young folded slice removed")
      val old = System.currentTimeMillis - 7L * 3600 * 1000
      deps.take(8).foreach(d =>
        Staged.slicePath(nm, "v1", d).toFile.setLastModified(old))
      Staged.deltaRelation(spark, nm, "v1", deps, compactEvery = 4)(build)
      assert(!java.nio.file.Files.exists(folded),
        "aged folded-away slice survived the sweep")
      assert(java.nio.file.Files.exists(tailSlice),
        "live tail slice was swept")
      assert(builds == 10)
      // prefix growth: two appended deps re-fold at 12; the new fold
      // re-ensures the swept slices through the per-dep protocol and
      // the content still equals the direct build
      val deps12 = deps ++ (10 until 12).map { i =>
        val p = dir.resolve(s"d$i.parquet").toString
        spark.range(i * 10, i * 10 + 10).toDF("n").write.parquet(p)
        p
      }
      val r3 = Staged.deltaRelation(spark, nm, "v1", deps12,
        compactEvery = 4)(build)
      val cpt12 = Staged.compactPath(nm, "v1", deps12)
      assert(java.nio.file.Files.exists(cpt12.resolve("_SUCCESS")),
        "grown prefix did not re-fold")
      val direct12 = spark.read.parquet(deps12: _*)
        .withColumn("sq", col("n") * col("n"))
      assert(r3.exceptAll(direct12).isEmpty &&
        direct12.exceptAll(r3).isEmpty)
    } finally Graft.deleteRecursively(dir)
  }

  test("maintainedRelation: a grown dep set builds via applyDelta on " +
      "the previous generation, a regenerated dep falls back to full, " +
      "and both routes yield identical content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_maint_spec_")
    try {
      val a = dir.resolve("a.parquet").toString
      val b = dir.resolve("b.parquet").toString
      spark.range(0, 12).toDF("n").write.parquet(a)
      spark.range(12, 18).toDF("n").write.parquet(b)
      var fulls = 0
      var deltas = 0
      // relation: counts per n % 3 — counting-mergeable, so the delta
      // path is partial-count union + re-sum
      def counts(paths: Seq[String]) = spark.read.parquet(paths: _*)
        .groupBy(pmod(col("n"), lit(3L)).as("g"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      def bf(deps: Seq[String]) = { fulls += 1; counts(deps) }
      var seenPrevDeps: Seq[String] = Nil
      def ad(prev: org.apache.spark.sql.DataFrame, prevDeps: Seq[String],
             added: Seq[String]) = {
        deltas += 1
        seenPrevDeps = prevDeps
        prev.unionByName(counts(added))
          .groupBy(col("g")).agg(sum(col("cnt")).cast("long").as("cnt"))
      }
      val g1 = Staged.maintainedRelation(spark, "spec_maint", "v1",
        Seq(a))(bf)(ad)
      assert(g1.count() == 3 && fulls == 1 && deltas == 0)
      val gen1Path = Staged.stagePath("spec_maint", "v1", Seq(a))
      val t1 = gen1Path.toFile.lastModified
      // grown dep set: delta route, previous generation untouched
      val g2 = Staged.maintainedRelation(spark, "spec_maint", "v1",
        Seq(a, b))(bf)(ad)
      assert(fulls == 1 && deltas == 1,
        s"expected the delta route, got fulls=$fulls deltas=$deltas")
      // ADVICE-r9: applyDelta receives the MATCHED generation's own dep
      // list from its manifest, not a caller-side reconstruction
      assert(seenPrevDeps == Seq(a),
        s"applyDelta got prevDeps=$seenPrevDeps, manifest said Seq($a)")
      assert(gen1Path.toFile.lastModified == t1)
      val direct = counts(Seq(a, b)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(g2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        == direct, "delta-built generation diverged from full rebuild")
      // re-read: served from the published generation, no new builds
      Staged.maintainedRelation(spark, "spec_maint", "v1",
        Seq(a, b))(bf)(ad).count()
      assert(fulls == 1 && deltas == 1)
      // regenerated dep: fingerprints break the subset match => full
      spark.range(0, 15).toDF("n").write.mode("overwrite").parquet(a)
      Staged.maintainedRelation(spark, "spec_maint", "v1",
        Seq(a, b))(bf)(ad).count()
      assert(fulls == 2 && deltas == 1,
        s"regenerated dep must rebuild full, got fulls=$fulls deltas=$deltas")
    } finally Graft.deleteRecursively(dir)
  }

  test("maintainedRelation: generation matching never crosses " +
      "relation-name boundaries (x must not adopt x_y's generations)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_iso_spec_")
    try {
      val a = dir.resolve("a.parquet").toString
      val b = dir.resolve("b.parquet").toString
      spark.range(0, 6).toDF("n").write.parquet(a)
      spark.range(6, 9).toDF("n").write.parquet(b)
      var fulls = 0
      var deltas = 0
      def counts(paths: Seq[String]) = spark.read.parquet(paths: _*)
        .groupBy(pmod(col("n"), lit(3L)).as("g"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      def bf(deps: Seq[String]) = { fulls += 1; counts(deps) }
      def ad(prev: org.apache.spark.sql.DataFrame, prevDeps: Seq[String],
             added: Seq[String]) = {
        deltas += 1
        prev.unionByName(counts(added))
          .groupBy(col("g")).agg(sum(col("cnt")).cast("long").as("cnt"))
      }
      // relation "spec_iso_x_y" publishes a generation over [a] whose
      // manifest WOULD subset-match "spec_iso_x"'s [a, b] under a naive
      // startsWith(name + "_") candidate scan
      Staged.maintainedRelation(spark, "spec_iso_x_y", "v1",
        Seq(a))(bf)(ad).count()
      assert(fulls == 1 && deltas == 0)
      Staged.maintainedRelation(spark, "spec_iso_x", "v1",
        Seq(a, b))(bf)(ad).count()
      assert(fulls == 2 && deltas == 0,
        s"spec_iso_x adopted a foreign generation: fulls=$fulls deltas=$deltas")
    } finally Graft.deleteRecursively(dir)
  }

  test("pruneSuperseded: a stale crash-orphan .build_ dir is swept on " +
      "publish; a fresh one survives the TTL gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_spec_")
    val root = java.nio.file.Paths.get(Staged.root)
    val stale = root.resolve("spec_prune_0123abcd.build_99")
    val fresh = root.resolve("spec_prune_0123abcd.build_98")
    try {
      val a = dir.resolve("a.parquet").toString
      spark.range(0, 3).toDF("n").write.parquet(a)
      java.nio.file.Files.createDirectories(stale)
      stale.toFile.setLastModified(
        System.currentTimeMillis() - 7L * 3600 * 1000)
      java.nio.file.Files.createDirectories(fresh)
      Staged.relation(spark, "spec_prune", "v1", Seq(a))(
        spark.range(0, 3).toDF("n")).count()
      assert(!java.nio.file.Files.exists(stale),
        "stale crash orphan survived the publish sweep")
      assert(java.nio.file.Files.exists(fresh),
        "the TTL gate must protect a possibly-in-flight build dir")
    } finally {
      Graft.deleteRecursively(dir)
      Graft.deleteRecursively(fresh)
      Graft.deleteRecursively(stale)
    }
  }

  test("relationDir: a layout artifact publishes once with the " +
      "writer-controlled file count; a writer that leaves no _SUCCESS " +
      "never publishes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rdir_spec_")
    try {
      val a = dir.resolve("in.parquet").toString
      spark.range(0, 64).toDF("n").write.parquet(a)
      var builds = 0
      def build(tmp: String): Unit = {
        builds += 1
        spark.read.parquet(a).repartition(1)
          .sortWithinPartitions(col("n"))
          .write.option("maxRecordsPerFile", 16).parquet(tmp)
      }
      val p1 = Staged.relationDir(spark, "spec_layout", "v1", Seq(a))(build)
      def parquetFiles(p: java.nio.file.Path) =
        Option(p.toFile.listFiles()).getOrElse(Array())
          .filter(_.getName.endsWith(".parquet"))
      assert(parquetFiles(p1).length == 4 && builds == 1,
        s"expected 4 files from maxRecordsPerFile=16 over 64 rows, " +
          s"got ${parquetFiles(p1).length} (builds=$builds)")
      val p2 = Staged.relationDir(spark, "spec_layout", "v1", Seq(a))(build)
      assert(p2 == p1 && builds == 1, "published artifact rebuilt")
      // a writer that produces no _SUCCESS must fail loudly and leave
      // nothing published (a crashed layout write is never served)
      intercept[IllegalArgumentException] {
        Staged.relationDir(spark, "spec_layout_bad", "v1", Seq(a)) { tmp =>
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(tmp))
        }
      }
      assert(!java.nio.file.Files.exists(
        Staged.stagePath("spec_layout_bad", "v1", Seq(a))))
    } finally Graft.deleteRecursively(dir)
  }

  test("co-purchase deployment (r10): generation growth takes the " +
      "delta route on the REAL maintained relation — the full rebuild " +
      "is not paid — and the delta-built counts equal the from-scratch " +
      "build over the grown dep set") {
    // VERDICT-r9 #3: maintainedRelation deployed to the production
    // graph family's pair counts, pinned with build counters on the
    // real builders (coPurchasePairBuilders) and the real relation
    // name. Fresh input copies => fresh fingerprints => this spec owns
    // its generations regardless of what queries ran before it.
    val dir = java.nio.file.Files.createTempDirectory("graft_cpd_spec_")
    try {
      val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
      for (f <- Seq("lineitem.parquet", "orders.parquet"))
        java.nio.file.Files.copy(src.resolve(f), dir.resolve(f))
      val d = dir.toString
      val slices = graft.queries.Relational.coPurchaseOrderSlices(spark, d)
      val (bf0, ad0) = graft.queries.Relational.coPurchasePairBuilders(spark, d)
      var fulls = 0
      var deltas = 0
      def bf(deps: Seq[String]) = { fulls += 1; bf0(deps) }
      def ad(p: org.apache.spark.sql.DataFrame, pd: Seq[String],
             a: Seq[String]) = { deltas += 1; ad0(p, pd, a) }
      val v = graft.queries.Relational.CoPurchaseVersion
      val liSrc = s"$d/lineitem.parquet"
      Staged.maintainedRelation(spark, "copurchase_paircounts", v,
        Seq(liSrc, slices.head))(bf)(ad).count()
      assert(fulls == 1 && deltas == 0)
      val counts = Staged.maintainedRelation(spark, "copurchase_paircounts",
        v, liSrc +: slices)(bf)(ad)
      assert(fulls == 1 && deltas == 1,
        s"generation growth paid the rebuild: fulls=$fulls deltas=$deltas")
      // delta ≡ rebuild, on the real builders over the grown dep set
      val direct = bf0(liSrc +: slices)
      assert(counts.exceptAll(direct).isEmpty &&
        direct.exceptAll(counts).isEmpty,
        "delta-built pair counts diverged from the from-scratch build")
      assert(counts.count() > 0)
    } finally Graft.deleteRecursively(dir)
  }

  test("staged relation names reject the reserved '__' slice infix " +
      "at every public entry point") {
    // ADVICE-r9: a relation literally named x__<8hex> would publish
    // generation dirs that deltaRelation(x)'s slice sweep matches —
    // its TTL pass could delete the other relation's live stage
    val dir = java.nio.file.Files.createTempDirectory("graft_resv_spec_")
    try {
      val a = dir.resolve("a.parquet").toString
      spark.range(0, 3).toDF("n").write.parquet(a)
      val df = spark.range(0, 3).toDF("n")
      intercept[IllegalArgumentException] {
        Staged.relation(spark, "bad__deadbeef", "v1", Seq(a))(df)
      }
      intercept[IllegalArgumentException] {
        Staged.deltaRelation(spark, "bad__deadbeef", "v1", Seq(a))(_ => df)
      }
      intercept[IllegalArgumentException] {
        Staged.maintainedRelation(spark, "bad__deadbeef", "v1", Seq(a))(
          _ => df)((_, _, _) => df)
      }
    } finally Graft.deleteRecursively(dir)
  }

  test("planScrub v5: operator flips change the signature; mirrored " +
      "comparison direction (the per-JVM Canonicalize hashCode flip) " +
      "does not") {
    def sig(s: String) = Graft.md5_8(Graft.planScrub(s))
    assert(sig("Filter (a#1 > 5)") != sig("Filter (a#1 <= 5)"))
    assert(sig("Filter (a#1 >= 5)") != sig("Filter (a#1 > 5)"))
    assert(sig("Project [(x#2 + y#3) AS s#4]") !=
      sig("Project [(x#2 - y#3) AS s#4]"))
    assert(sig("Project [(x#2 * y#3) AS s#4]") !=
      sig("Project [(x#2 / y#3) AS s#4]"))
    // the r9 q221 residue, reproduced from the captured variant texts:
    // Canonicalize puts the smaller-hashCode operand first and flips
    // the comparator — `a < b` and `b > a` are the SAME predicate and
    // must hash identically across JVMs
    assert(sig("Join Inner, (dist#3 < 50.0)") ==
      sig("Join Inner, (50.0 > dist#3)"))
    assert(sig("Filter (a#1 <= b#2)") == sig("Filter (b#2 >= a#1)"))
  }

  test("planScrub v6: the canonicalized exprId-to-attribute binding " +
      "permutation (the q232 bimodal) hashes identically; operator and " +
      "type flips still flip") {
    def sig(s: String) = Graft.md5_8(Graft.planScrub(s))
    // the exact r11 q232 flip shape, reproduced from the two COMMITTED
    // plan-capture variants (builder vs driver rerun): the same atom
    // multiset, but which ordinal carries the L suffix permutes —
    // run-dependent canonicalization noise, not plan structure
    assert(sig("Aggregate [count(none#1), first(none#2L)]") ==
      sig("Aggregate [count(none#2), first(none#1L)]"))
    assert(sig("Expand [none#0, none#1L, none#2]") ==
      sig("Expand [none#2, none#0L, none#1]"))
    // type changes and arity changes still flip
    assert(sig("Aggregate [count(none#1), first(none#2L)]") !=
      sig("Aggregate [count(none#1L), first(none#2L)]"))
    assert(sig("Expand [none#0, none#1L]") !=
      sig("Expand [none#0, none#1L, none#2]"))
    // operator flips still flip (the v5 guarantees carry over)
    assert(sig("Aggregate [sum(none#1L)]") != sig("Aggregate [max(none#1L)]"))
  }

  test("planScrub v7 (ADVICE-r12): within-line reference structure is " +
      "distinguished again — one attr used twice vs two attrs used " +
      "once — without reintroducing the binding-permutation noise") {
    def sig(s: String) = Graft.md5_8(Graft.planScrub(s))
    // the distinction v6 gave up, restored by the per-line
    // distinct-ordinal count (NREF1 vs NREF2)
    assert(sig("Filter (none#1 = none#1)") !=
      sig("Filter (none#1 = none#2)"))
    // still invariant under the q232 binding permutation composed with
    // the commutative operand reorder (first-occurrence RENUMBERING
    // would flip on exactly these pairs — why v7 counts instead)
    assert(sig("Filter (none#1 = none#2L)") ==
      sig("Filter (none#2L = none#1)"))
    assert(sig("Filter (none#1 = none#2L)") ==
      sig("Filter (none#1L = none#2)"))
    // a cross-line permutation moves ordinal VALUES between lines but
    // never a line's distinct count
    assert(sig("Project [none#1]\nFilter (none#2L = 5)") ==
      sig("Project [none#2]\nFilter (none#1L = 5)"))
  }

  test("planScrub v4: invariant under commutative operand reorder " +
      "(the cross-JVM Canonicalize hashCode ordering)") {
    def sig(s: String) = Graft.md5_8(Graft.planScrub(s))
    assert(sig("Project [(1.96 * SQRT(x#3)) AS z#4]") ==
      sig("Project [(SQRT(x#3) * 1.96) AS z#4]"))
    assert(sig("Filter (isnotnull(x#1) AND (x#1 > 5))") ==
      sig("Filter ((x#1 > 5) AND isnotnull(x#1))"))
  }

  test("planScrub v4: still scrubs per-JVM noise (lambda ids, object " +
      "hashes, temp paths)") {
    def sig(s: String) = Graft.md5_8(Graft.planScrub(s))
    assert(sig("UDF(Foo$$Lambda$123/0x00007f abc)") ==
      sig("UDF(Foo$$Lambda$987/0x00001a abc)"))
    assert(sig("Relation[/tmp/graft_ab12/part] x") ==
      sig("Relation[/tmp/graft_zz99/part] x"))
  }

  test("identical DataFrame plans built twice yield one signature; a " +
      "flipped predicate direction yields another") {
    val df1 = spark.range(10).toDF("n").filter(col("n") > 3)
    val df2 = spark.range(10).toDF("n").filter(col("n") > 3)
    val df3 = spark.range(10).toDF("n").filter(col("n") <= 3)
    assert(Graft.planSignature(df1) == Graft.planSignature(df2))
    assert(Graft.planSignature(df1) != Graft.planSignature(df3))
  }
}

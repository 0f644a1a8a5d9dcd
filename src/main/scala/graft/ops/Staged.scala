package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Staged-relation registry (r8, SURVEY §7.6) — the materialized-view
  * move for any deterministic relation consumed by a query FAMILY:
  * build once per input-data state, publish atomically, read as a
  * columnar scan everywhere else. Generalizes the q179-family
  * co-purchase memoization (queries/Relational.scala) so the next
  * family-shared relation doesn't re-implement the staging protocol.
  *
  * Correctness protocol:
  *  - the stage key fingerprints the INPUT FILES' (size, mtime) plus
  *    the relation name plus a CODE-VERSION token (r9) — regenerated
  *    testdata rebuilds instead of serving stale rows, and an edit to
  *    the builder plan bumps its version so a persisted /tmp stage
  *    from the pre-edit code can never satisfy the post-edit query
  *    (the ADVICE-r8 staleness hole);
  *  - the build lands in a temp dir renamed into place with
  *    ATOMIC_MOVE — a killed build can never be read as a complete
  *    stage (parquet's _SUCCESS is checked before reuse);
  *  - a published directory is NEVER deleted in-line (r9): if the key
  *    re-check after a build finds the stage was published meanwhile
  *    (another thread or JVM won the race), the freshly built temp dir
  *    is discarded and the published one served — readers can rely on
  *    a dir with _SUCCESS staying intact for the JVM's lifetime;
  *  - superseded stages (same relation, different key — i.e. old data
  *    generations or old code versions) are pruned opportunistically
  *    AFTER a successful publish, but only once they are over six
  *    hours old. The age gate is what makes pruning safe: stages of
  *    the SAME session (e.g. the test suite's sf0.001 stage and the
  *    bench's sf0.1 stage, which coexist under different keys) are
  *    never touched, while old rounds' generations — the unbounded
  *    /tmp growth ADVICE-r8 flagged — are collected. A multi-tenant
  *    deployment would swap the fixed TTL for lease-based GC.
  *  - builds are serialized per JVM (one global lock: stages are rare
  *    and build-once by design).
  * The relation MUST be deterministic for the staging to be
  * semantics-free; anything hash/sample/time-dependent belongs in the
  * query, not a stage.
  */
object Staged {

  private val lock = new Object
  private[graft] val root = "/tmp/graft_stage"

  /** The `__` infix is RESERVED for [[deltaRelation]] slice dirs
    * (`name__<dephash>_<key>`): a relation literally named `x__<8hex>`
    * would publish generation dirs that `isSliceDir(x)` matches, so
    * relation x's slice sweep could delete that other relation's live
    * stage (ADVICE-r9). Rejected at every public entry point.
    */
  private def requireName(name: String): Unit =
    require(!name.contains("__"),
      s"staged relation name '$name' contains the reserved '__' infix " +
        "(slice-dir namespace)")

  /** Fingerprint: relation name + code version + per-dep (size, mtime).
    * A directory dep (e.g. another published stage) is fingerprinted by
    * its sorted leaf files — ATOMIC_MOVE preserves inner mtimes, so a
    * published stage's fingerprint is stable for its lifetime and
    * staged-on-staged composition (a delta slice whose dep is itself a
    * staged relation) keys correctly.
    */
  private def key(name: String, version: String, deps: Seq[String]): String = {
    val parts = deps.flatMap { p0 =>
      val p = java.nio.file.Paths.get(p0)
      val leaves =
        if (java.nio.file.Files.isDirectory(p)) {
          val st = java.nio.file.Files.walk(p)
          try st.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .toVector.sortBy(_.toString)
          finally st.close()
        } else Vector(p)
      leaves.map(l => s"$l:${java.nio.file.Files.size(l)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(l).toMillis}")
    }
    graft.Graft.md5_8(name + "|" + version + "|" + parts.mkString("|"))
  }

  /** The exact directory `relation` reads/publishes for this (name,
    * version, input-state) triple — exposed so specs resolve the stage
    * they exercised instead of scanning /tmp by mtime (the r8 GraphSpec
    * hermeticity bug: maxBy(lastModified) picked up a later bench run's
    * sf0.1 stage).
    */
  def stagePath(name: String, version: String,
                deps: Seq[String]): java.nio.file.Path =
    java.nio.file.Paths.get(s"$root/${name}_${key(name, version, deps)}")

  /** Read the staged form of `name`, building it first if this
    * (code-version, input-state) pair has never been staged. `deps` are
    * the input files whose bytes the relation derives from; `version`
    * is a hand-bumped token tied to the builder plan's definition.
    */
  def relation(s: SparkSession, name: String, version: String,
               deps: Seq[String])(build: => DataFrame): DataFrame = {
    requireName(name)
    relationImpl(s, name, version, deps)(build)
  }

  /** [[relation]] minus the reserved-name check — the internal entry
    * [[deltaRelation]] uses to publish its slice dirs (whose names
    * legitimately carry the `__` infix).
    */
  private def relationImpl(s: SparkSession, name: String, version: String,
                           deps: Seq[String])(build: => DataFrame): DataFrame =
    s.read.parquet(
      ensured(s, name, version, deps)(build).toString)

  /** The ensure-published half of [[relationImpl]]: build+publish if
    * needed, return the stage PATH without reading it. Split out (r12)
    * so [[deltaRelation]] can serve its N slices as ONE multi-path
    * parquet read — a per-slice `read.parquet` costs a schema-inference
    * Spark job and a Union plan node PER SLICE, which at 10⁵ slices is
    * both a driver-serialized job loop and a plan-size explosion.
    */
  private def ensured(s: SparkSession, name: String, version: String,
                      deps: Seq[String])(build: => DataFrame): java.nio.file.Path = {
    val stage = stagePath(name, version, deps)
    def published = java.nio.file.Files.exists(stage.resolve("_SUCCESS"))
    lock.synchronized {
      if (!published) {
        val tmp = java.nio.file.Paths.get(
          stage.toString + s".build_${System.nanoTime()}")
        // ADVICE-r10: a throwing builder must not leave its .build_ dir
        // behind — the orphan sweep only runs on a LATER successful
        // publish of the same relation, so repeated failing builds
        // would accumulate /tmp garbage unbounded in the meantime.
        try {
          build.write.mode("overwrite").parquet(tmp.toString)
          java.nio.file.Files.createDirectories(stage.getParent)
          // Re-check under the lock: a concurrent JVM may have published
          // while we built. Published dirs are immutable — discard ours.
          if (published) graft.Graft.deleteRecursively(tmp)
          else {
            // A keyless leftover (dir without _SUCCESS) can only be a
            // pre-r9 artifact or a crashed non-atomic writer; clear it.
            graft.Graft.deleteRecursively(stage)
            java.nio.file.Files.move(tmp, stage,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            pruneSuperseded(name, stage)
          }
        } catch {
          case e: Throwable =>
            try graft.Graft.deleteRecursively(tmp)
            catch { case _: java.io.IOException => () }
            throw e
        }
      }
    }
    stage
  }

  /** Staged DIRECTORY artifact with a caller-controlled writer (r10):
    * [[relation]] covers "build = one DataFrame written with default
    * options"; LAYOUT-producing builders need control of the write
    * itself (file count via maxRecordsPerFile, sort order, footer
    * blooms) — the artifact is the directory's file layout, not just
    * its rows. Same protocol: fingerprint key, build into a temp dir,
    * require the writer's own `_SUCCESS`, publish by ATOMIC_MOVE,
    * never delete a published dir in-line, prune superseded
    * generations after the TTL. Returns the published path (the
    * artifact is consumed by path — e.g. as another staged relation's
    * dep — not as a DataFrame).
    */
  def relationDir(s: SparkSession, name: String, version: String,
                  deps: Seq[String])(write: String => Unit): java.nio.file.Path = {
    requireName(name)
    val stage = stagePath(name, version, deps)
    def published = java.nio.file.Files.exists(stage.resolve("_SUCCESS"))
    lock.synchronized {
      if (!published) {
        val tmp = java.nio.file.Paths.get(
          stage.toString + s".build_${System.nanoTime()}")
        // ADVICE-r10: delete the temp dir on ANY failure path (writer
        // throw or missing _SUCCESS) — see relationImpl's rationale
        try {
          write(tmp.toString)
          require(java.nio.file.Files.exists(tmp.resolve("_SUCCESS")),
            s"relationDir $name: writer left no _SUCCESS marker")
          java.nio.file.Files.createDirectories(stage.getParent)
          if (published) graft.Graft.deleteRecursively(tmp)
          else {
            graft.Graft.deleteRecursively(stage)
            java.nio.file.Files.move(tmp, stage,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            pruneSuperseded(name, stage)
          }
        } catch {
          case e: Throwable =>
            try graft.Graft.deleteRecursively(tmp)
            catch { case _: java.io.IOException => () }
            throw e
        }
      }
    }
    stage
  }

  /** The slice directory `deltaRelation` reads/publishes for one dep of
    * a delta-staged relation — exposed for the same reason as
    * [[stagePath]] (specs resolve slices by fingerprint, never by
    * scanning /tmp).
    */
  def slicePath(name: String, version: String,
                dep: String): java.nio.file.Path =
    stagePath(sliceName(name, dep), version, Seq(dep))

  private def sliceName(name: String, dep: String): String =
    s"${name}__${graft.Graft.md5_8(dep)}"

  /** The compacted-prefix stage a [[deltaRelation]] with `compactEvery`
    * serves — exposed for specs. The `__compact` infix keeps it out of
    * both the slice-dir namespace (`name__<8hex>_<8hex>` — length
    * mismatch) and other relations' generation namespaces (exact-format
    * match), so neither sweep can touch the other's dirs.
    */
  def compactPath(name: String, version: String,
                  prefixDeps: Seq[String]): java.nio.file.Path =
    stagePath(s"${name}__compact", version, prefixDeps)

  /** Delta-aware staged relation (SURVEY §7.6, the q340 IVF main∪delta
    * pattern promoted into the staging protocol): for a relation that
    * is a PER-DEP map — `build(dep)` derives rows ONLY from `dep`'s
    * bytes, so the relation over a dep set is the union of per-dep
    * builds — each dep is staged under its OWN fingerprint. An
    * appended dep builds only its slice; a regenerated dep rebuilds
    * only its slice; untouched deps keep serving their published
    * slices — maintenance cost is O(|Δ|), not O(corpus). [[relation]]
    * by contrast keys the WHOLE build on the WHOLE dep set: any input
    * change rebuilds everything (the right call when the build is a
    * cross-dep join, wrong for row-local derivations).
    *
    * The slice name embeds a hash of the dep path — REQUIRED for
    * pruning correctness: [[pruneSuperseded]] treats same-name dirs
    * under other keys as superseded, and two LIVE slices of one
    * relation must never prune each other. Slices whose dep path
    * itself vanished (e.g. an upstream staged dir that re-keyed) are
    * swept here against the live slice set, same TTL gate.
    *
    * A dep may be a file or a directory (e.g. a stage published by
    * [[relation]] — staged-on-staged composition keys correctly via
    * the directory fingerprint).
    *
    * Slice COMPACTION (r11, VERDICT-r10 #6): left alone, the relation
    * accretes one slice dir per dep forever — at 10⁵ deps that is 10⁵
    * parquet reads unioned per serve (read amplification) and 10⁵
    * dirs on disk. With `compactEvery` = k > 0, the LSM move: once the
    * dep list holds ≥ k deps, the stable PREFIX (⌊n/k⌋·k oldest deps —
    * append-only inputs only grow on the right) is folded into ONE
    * published stage whose content is by construction the union of
    * exactly those deps' slices, keyed on (name__compact, version,
    * prefix fingerprints) through the normal relation protocol — so
    * the fold is ATOMIC_MOVE-published and a live reader sees either
    * the old slices or the complete fold, never a partial one. Serving
    * reads compacted ∪ tail slices. Folded-away slices stop being
    * `live` and sweep under the same 6 h TTL gate as superseded
    * generations; a later fold (grown prefix) re-ensures any swept
    * slice through its per-dep protocol before unioning. All callers
    * of one relation must pass the same `compactEvery` — the value is
    * part of the relation's layout contract.
    */
  def deltaRelation(s: SparkSession, name: String, version: String,
                    deps: Seq[String], compactEvery: Int = 0)
                   (build: String => DataFrame): DataFrame = {
    requireName(name)
    require(deps.nonEmpty, s"deltaRelation $name needs at least one dep")
    // ensure-published per slice, but SERVE as one multi-path read
    // (r12): a per-slice read.parquet + unionByName costs a schema-
    // inference job and a Union leg per slice — O(N) driver jobs and
    // plan nodes per serve at 10⁵ slices. All slices of one relation
    // share the builder's schema, so a multi-path scan IS the union.
    def slicePathOf(dep: String): java.nio.file.Path =
      ensured(s, sliceName(name, dep), version, Seq(dep))(build(dep))
    val prefixLen =
      if (compactEvery > 0) (deps.size / compactEvery) * compactEvery else 0
    val (prefix, tail) = deps.splitAt(prefixLen)
    val compacted: Option[java.nio.file.Path] =
      if (prefixLen > 0)
        Some(ensured(s, s"${name}__compact", version, prefix) {
          s.read.parquet(prefix.map(d => slicePathOf(d).toString): _*)
        })
      else None
    val out = s.read.parquet(
      (compacted.toSeq ++ tail.map(slicePathOf)).map(_.toString): _*)
    // folded-away prefix slices are no longer live — the TTL sweep
    // below may collect them once they age out
    val liveDeps = if (compacted.isDefined) tail else deps
    val live = liveDeps.map(dep =>
      slicePath(name, version, dep).getFileName.toString).toSet
    lock.synchronized {
      val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array())
      val staleMs = System.currentTimeMillis() - 6L * 3600 * 1000
      def isSliceDir(dn: String): Boolean = {
        // exactly name__<8hex>_<8hex> — see isGeneration's rationale
        val rest = dn.drop(name.length + 2)
        dn.startsWith(name + "__") && rest.length == 17 &&
          rest(8) == '_' && (rest.take(8) + rest.drop(9)).forall(c =>
            (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))
      }
      // ADVICE-r12: a JVM crash mid-prepublishSlices leaves a
      // `name.slicebatch_<nanos>` temp dir that neither the generation
      // sweep (pruneSuperseded never runs under the BARE relation name)
      // nor the slice matcher above collects — the same unbounded-/tmp
      // class as the `.build_` orphans. Swept here, same TTL gate.
      def isSliceBatchOrphan(dn: String): Boolean =
        dn.startsWith(name + ".slicebatch_") &&
          dn.drop(name.length + 12).nonEmpty &&
          dn.drop(name.length + 12).forall(_.isDigit)
      dirs.filter { f =>
        ((isSliceDir(f.getName) && !live.contains(f.getName)) ||
          isSliceBatchOrphan(f.getName)) &&
          f.lastModified < staleMs
      }.foreach(f => try graft.Graft.deleteRecursively(f.toPath)
        catch { case _: java.io.IOException => () })
    }
    out
  }

  /** Batch slice prepass for [[deltaRelation]] (r12, VERDICT-r11 #2):
    * publish the slices of every not-yet-published dep from ONE bulk
    * build, instead of one driver-dispatched Spark job per dep — the
    * cold-build path previously degenerated to N sequential 1-task
    * jobs (job-dispatch latency × files) on a fresh 10⁶-file layout
    * or a bulk commit.
    *
    * Contract: `bulkBuild(missing)` returns the union of the per-dep
    * builds over exactly `missing`, with an extra string column
    * `__dep` naming each row's dep — the rows for dep d, minus
    * `__dep`, must equal what [[deltaRelation]]'s `build(d)` returns
    * (specs pin that equivalence per adopter). The bulk output is
    * written ONCE, partitioned by an 8-hex dep fingerprint, and each
    * partition directory is promoted to its slice stage under the
    * normal keying ([[slicePath]] — same fingerprints, so a later
    * [[deltaRelation]] call serves these slices without building).
    *
    * Safety: deps whose 8-hex fingerprints collide in this batch are
    * left OUT (the per-dep fallback builds them — correctness never
    * rides on hash uniqueness); a dep yielding zero rows produces no
    * partition dir and likewise falls through to the per-dep build;
    * promotion happens under the build lock with the published
    * re-check, and the bulk temp dir is removed on every exit path.
    * This is an OPTIMIZATION prepass: skipping it entirely leaves
    * [[deltaRelation]]'s semantics unchanged.
    */
  def prepublishSlices(s: SparkSession, name: String, version: String,
                       deps: Seq[String])
                      (bulkBuild: Seq[String] => DataFrame): Unit = {
    requireName(name)
    import org.apache.spark.sql.functions.{col, md5, substring}
    val unpublished = deps.filterNot(d => java.nio.file.Files.exists(
      slicePath(name, version, d).resolve("_SUCCESS")))
    // batch only fingerprint-unique deps (collisions → per-dep path).
    // r13 (VERDICT-r12 #3): the BATCH key is 16 hex — at the 10⁵-dep
    // bulk commits this prepass targets, 8-hex collisions (~11 % odds
    // at 10⁵) silently demoted colliding pairs to the per-dep loop;
    // 16 hex pushes the first expected collision past 10⁸ deps. Slice
    // DIR naming stays 8-hex (slicePath): there the fingerprint key
    // disambiguates, here the partition value must be unique in-batch.
    val missing = unpublished.groupBy(graft.Graft.md5_16)
      .collect { case (_, Seq(one)) => one }.toSeq.sorted
    if (missing.isEmpty) return
    lock.synchronized {
      val still = missing.filterNot(d => java.nio.file.Files.exists(
        slicePath(name, version, d).resolve("_SUCCESS")))
      if (still.isEmpty) return
      val tmp = java.nio.file.Paths.get(
        s"$root/${name}.slicebatch_${System.nanoTime()}")
      try {
        val df = bulkBuild(still)
        require(df.columns.contains("__dep"),
          s"prepublishSlices $name: bulk build must carry a __dep column")
        // spark md5 hex == Graft.md5_16's digest prefix, so the
        // partition value IS the batch fingerprint (16 hex chars:
        // no partition-path escaping to reverse)
        df.withColumn("__sk", substring(md5(col("__dep")), 1, 16))
          .drop("__dep")
          .write.partitionBy("__sk").mode("overwrite").parquet(tmp.toString)
        require(java.nio.file.Files.exists(tmp.resolve("_SUCCESS")),
          s"prepublishSlices $name: bulk write left no _SUCCESS")
        for (dep <- still) {
          val src = tmp.resolve(s"__sk=${graft.Graft.md5_16(dep)}")
          val target = slicePath(name, version, dep)
          if (java.nio.file.Files.isDirectory(src) &&
              !java.nio.file.Files.exists(target.resolve("_SUCCESS"))) {
            java.nio.file.Files.createFile(src.resolve("_SUCCESS"))
            java.nio.file.Files.createDirectories(target.getParent)
            graft.Graft.deleteRecursively(target)
            java.nio.file.Files.move(src, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        }
      } finally {
        try graft.Graft.deleteRecursively(tmp)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Per-dep fingerprint line for the generation manifest. */
  private def depLine(p0: String): String = {
    val p = java.nio.file.Paths.get(p0)
    val leaves =
      if (java.nio.file.Files.isDirectory(p)) {
        val st = java.nio.file.Files.walk(p)
        try st.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .toVector.sortBy(_.toString)
        finally st.close()
      } else Vector(p)
    p0 + "=>" + leaves.map(l => s"${java.nio.file.Files.size(l)}:" +
      s"${java.nio.file.Files.getLastModifiedTime(l).toMillis}").mkString(",")
  }

  /** Incrementally MAINTAINED staged relation (r9, SURVEY §7.6
    * "Staged + IVM composition"): like [[relation]], but when the dep
    * set GROWS (append-only input: every previously-seen dep unchanged,
    * new deps added), the new generation is built by `applyDelta(
    * previousGeneration, addedDeps)` instead of `buildFull(deps)` —
    * the staged-relation protocol meets the counting-IVM move (q348).
    * Each published generation records its dep fingerprints in a
    * `_graft_deps` manifest (underscore-prefixed: invisible to the
    * parquet reader, ATOMIC_MOVE'd with the data); candidate previous
    * generations are matched by manifest, never by mtime. Falls back
    * to `buildFull` when no prior generation qualifies (first build,
    * regenerated deps, or shrunk dep set) — the delta path is an
    * OPTIMIZATION with identical semantics, which callers must
    * guarantee (applyDelta(gen(D0), D0, D1) ≡ buildFull(D0 ∪ D1));
    * specs pin that equivalence per adopter.
    *
    * `applyDelta(prev, prevDeps, added)` receives the MATCHED
    * generation's own dep list (parsed from its manifest), not just
    * the added deps (ADVICE-r9): delta logic that references the old
    * input (e.g. the q348 decomposition's base-basket anti-join) must
    * pair against the generation actually adopted — a caller that
    * reconstructs "the base" from its own context can silently drift
    * from the manifest match.
    */
  def maintainedRelation(s: SparkSession, name: String, version: String,
                         deps: Seq[String])
                        (buildFull: Seq[String] => DataFrame)
                        (applyDelta: (DataFrame, Seq[String], Seq[String]) => DataFrame)
      : DataFrame = {
    requireName(name)
    val stage = stagePath(name, version, deps)
    def published = java.nio.file.Files.exists(stage.resolve("_SUCCESS"))
    lock.synchronized {
      if (!published) {
        val lines = deps.map(depLine)
        // previous generation: same name+version, manifest a strict
        // subset of the new dep lines (same fingerprints), most deps
        // wins; its OWN key differs (deps changed), so target != prev
        val prev = Option(new java.io.File(root).listFiles()).getOrElse(Array())
          .filter(f => isGeneration(name, f.getName) &&
            java.nio.file.Files.exists(f.toPath.resolve("_SUCCESS")) &&
            java.nio.file.Files.exists(f.toPath.resolve("_graft_deps")))
          .flatMap { f =>
            val m = new String(java.nio.file.Files.readAllBytes(
              f.toPath.resolve("_graft_deps")), "UTF-8").split("\n").toSeq
            val (v, old) = (m.head, m.tail)
            if (v == version && old.nonEmpty && old.size < lines.size &&
              old.forall(lines.contains)) Some((f.toPath, old.size))
            else None
          }.sortBy(-_._2).headOption
        val built = prev match {
          case Some((prevPath, nOld)) =>
            val oldLineSeq = new String(java.nio.file.Files.readAllBytes(
              prevPath.resolve("_graft_deps")), "UTF-8").split("\n").tail.toSeq
            val oldLines = oldLineSeq.toSet
            // the matched generation's OWN dep paths, manifest order
            val prevDeps = oldLineSeq.map { l =>
              val cut = l.lastIndexOf("=>")
              require(cut > 0, s"maintained stage $name: bad manifest line")
              l.substring(0, cut)
            }
            val added = deps.filter(dp => !oldLines.contains(depLine(dp)))
            require(added.size == deps.size - nOld,
              s"maintained stage $name: dep manifest mismatch")
            applyDelta(s.read.parquet(prevPath.toString), prevDeps, added)
          case None => buildFull(deps)
        }
        val tmp = java.nio.file.Paths.get(
          stage.toString + s".build_${System.nanoTime()}")
        // ADVICE-r10: clean the temp dir on failure — see relationImpl
        try {
          built.write.mode("overwrite").parquet(tmp.toString)
          java.nio.file.Files.write(tmp.resolve("_graft_deps"),
            (version +: deps.map(depLine)).mkString("\n").getBytes("UTF-8"))
          java.nio.file.Files.createDirectories(stage.getParent)
          if (published) graft.Graft.deleteRecursively(tmp)
          else {
            graft.Graft.deleteRecursively(stage)
            java.nio.file.Files.move(tmp, stage,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            pruneSuperseded(name, stage)
          }
        } catch {
          case e: Throwable =>
            try graft.Graft.deleteRecursively(tmp)
            catch { case _: java.io.IOException => () }
            throw e
        }
      }
    }
    s.read.parquet(stage.toString)
  }

  /** Drop stages of the same relation under superseded keys once they
    * age past the TTL (see the class doc for why the age gate makes
    * this safe), plus orphaned `.build_` temp dirs from crashed builds.
    * Bounds /tmp growth across data regenerations (ADVICE-r8). Must run
    * under the build lock.
    */
  private def pruneSuperseded(name: String, keep: java.nio.file.Path): Unit = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array())
    val staleMs = System.currentTimeMillis() - 6L * 3600 * 1000
    // a crashed build's temp dir is `name_<8hex>.build_<nanos>` — the
    // generation name plus the build suffix (r10: the filter previously
    // matched only exact generation names, so crash orphans survived
    // the sweep despite the doc's claim)
    def isBuildOrphan(dn: String): Boolean = {
      val cut = dn.indexOf(".build_")
      cut > 0 && isGeneration(name, dn.substring(0, cut))
    }
    dirs.filter { f =>
      (isGeneration(name, f.getName) || isBuildOrphan(f.getName)) &&
        f.toPath != keep && f.lastModified < staleMs
    }.foreach(f => try graft.Graft.deleteRecursively(f.toPath)
      catch { case _: java.io.IOException => () })
  }

  /** A dir is a generation of `name` iff its name is exactly
    * `name_<8-hex-key>` — a plain `startsWith(name + "_")` would also
    * match any OTHER relation whose name extends this one
    * (`x_<key>` vs `x_y_<key>`), making pruning and previous-generation
    * matching cross relation boundaries.
    */
  private def isGeneration(name: String, dirName: String): Boolean =
    dirName.length == name.length + 9 &&
      dirName.startsWith(name + "_") &&
      dirName.drop(name.length + 1).forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))
}

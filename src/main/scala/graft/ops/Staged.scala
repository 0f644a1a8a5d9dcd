package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged-relation registry (r8, SURVEY §7.6) — the materialized-view
  * move for any deterministic relation consumed by a query FAMILY:
  * build once per input-data state, publish atomically, read as a
  * columnar scan everywhere else. Generalizes the q179-family
  * co-purchase memoization (queries/Relational.scala) so the next
  * family-shared relation doesn't re-implement the staging protocol.
  *
  * Correctness protocol:
  *  - the stage key fingerprints the INPUT FILES' (size, mtime) plus
  *    the relation name — regenerated testdata (same path, new bytes)
  *    rebuilds instead of serving stale rows;
  *  - the build lands in a temp dir renamed into place with
  *    ATOMIC_MOVE — a killed build can never be read as a complete
  *    stage (parquet's _SUCCESS is checked before reuse);
  *  - builds are serialized per JVM (one global lock: stages are rare
  *    and build-once by design; cross-JVM races are benign because
  *    each JVM builds into its own temp dir and the atomic rename
  *    makes last-writer-wins of identical content).
  * The relation MUST be deterministic for the staging to be
  * semantics-free; anything hash/sample/time-dependent belongs in the
  * query, not a stage.
  */
object Staged {

  private val lock = new Object
  private val root = "/tmp/graft_stage"

  /** Fingerprint of dependency files: name + per-file (size, mtime). */
  private def key(name: String, deps: Seq[String]): String = {
    val parts = deps.map { p0 =>
      val p = java.nio.file.Paths.get(p0)
      s"$p0:${java.nio.file.Files.size(p)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
    }
    graft.Graft.md5_8(name + "|" + parts.mkString("|"))
  }

  /** Read the staged form of `name`, building it first if this input
    * state has never been staged. `deps` are the input files whose
    * bytes the relation derives from.
    */
  def relation(s: SparkSession, name: String, deps: Seq[String])
              (build: => DataFrame): DataFrame = {
    val stage = java.nio.file.Paths.get(s"$root/${name}_${key(name, deps)}")
    lock.synchronized {
      if (!java.nio.file.Files.exists(stage.resolve("_SUCCESS"))) {
        val tmp = java.nio.file.Paths.get(
          stage.toString + s".build_${System.nanoTime()}")
        build.write.mode("overwrite").parquet(tmp.toString)
        graft.Graft.deleteRecursively(stage)
        java.nio.file.Files.createDirectories(stage.getParent)
        java.nio.file.Files.move(tmp, stage,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    s.read.parquet(stage.toString)
  }
}

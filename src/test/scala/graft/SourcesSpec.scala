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
}

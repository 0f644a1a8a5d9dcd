package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived stress-input generator (r11, VERDICT-r10 #3 — the "next
  * decade" rehearsal for the overflow/skew class). The sf0.1 sweep
  * caught q301's Σy² Long overflow precisely because the gate scale
  * grew; this main synthesizes a ~10× input (≈ sf1: 6M lineitem rows)
  * as a DETERMINISTIC self-union with key remapping — `/root/testdata`
  * is read-only, so the derived tables land under /tmp:
  *
  *   sbt "runMain graft.StressGen /root/testdata/sf0.1 /tmp/graft_stress/sf1 10"
  *
  * Remapping scheme (replica k of F):
  *  - fact ids shift by k·(max+1): event_id, o_orderkey/l_orderkey
  *    (SHIFTED CONSISTENTLY so the orders↔lineitem join keys stay
  *    intact across replicas), doc_id, vec_id;
  *  - foreign keys into UNSCALED dims (custkey, partkey, suppkey,
  *    user_id) stay — each customer simply owns F× the orders, which
  *    is exactly the mild skew growth the rehearsal wants;
  *  - all value columns stay, so the replicated sums grow linearly and
  *    any accumulator that was within one decade of overflow at sf0.1
  *    crosses it here, while DuckDB's int128 oracle arithmetic stays
  *    exact.
  * Dims (region nation customer supplier part) copy through unchanged.
  * Everything is a pure function of the source tables — re-running
  * regenerates byte-stable content (modulo parquet encoding), and the
  * oracle replays over the SAME derived tables, so correctness is
  * still exact equality, not an extrapolated contract.
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StressGen <srcDir> <outDir> [factor=10]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1)
    val spark = SparkSession.builder()
      .appName("graft-stressgen").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try {
      def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
      def write(t: String, df: DataFrame): Unit = {
        df.write.mode("overwrite").parquet(s"$out/$t.parquet")
        println(s"[stressgen] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
      }
      // replicate with per-replica shifts on the named id columns; a
      // shift base is max+1 over ITS key's home table so replica id
      // ranges never collide — and l_orderkey shifts by ORDERS' base,
      // not its own, or the orders↔lineitem join would break on
      // replicas past the first
      def scale(df: DataFrame, shifts: Map[String, Long]): DataFrame =
        (0 until factor).map { k =>
          shifts.foldLeft(df) { case (d, (c, base)) =>
            d.withColumn(c, col(c) + lit(k * base))
          }
        }.reduce(_.unionByName(_))
      def base(df: DataFrame, c: String): Long =
        df.agg(max(col(c))).head.getLong(0) + 1L
      for (t <- Seq("region", "nation", "customer", "supplier", "part"))
        write(t, read(t))
      val ev = read("events")
      write("events", scale(ev, Map("event_id" -> base(ev, "event_id"))))
      val ord = read("orders")
      val orderBase = base(ord, "o_orderkey")
      write("orders", scale(ord, Map("o_orderkey" -> orderBase)))
      write("lineitem",
        scale(read("lineitem"), Map("l_orderkey" -> orderBase)))
      val docs = read("documents")
      write("documents", scale(docs, Map("doc_id" -> base(docs, "doc_id"))))
      val emb = read("embeddings")
      write("embeddings", scale(emb, Map("vec_id" -> base(emb, "vec_id"))))
    } finally spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

/** Pins ext.Graph: transition-edge extraction (self-loop drop, count
  * weights, per-entity ordering) and the PageRank ladder (mass
  * conservation, dangling redistribution, hand-computed round values).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("transitionEdges: self-loops drop, repeats count, order is per entity") {
    val ev = Seq(
      (1L, 10L, 5L), (1L, 20L, 5L), (1L, 30L, 7L), // 5→5 dropped, 5→7
      (1L, 40L, 5L), (1L, 50L, 7L),                // 5→7 again, 7→5 at 40
      (2L, 10L, 7L), (2L, 20L, 5L)                 // 7→5
    ).toDF("user", "ts", "node")
    val got = Graph.transitionEdges(ev, col("user"), col("node"),
        col("ts")).orderBy(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((5L, 7L, 2L), (7L, 5L, 2L)))
  }

  test("pageRank: hand-computed one-round chain with a dangling node") {
    // 1→2→3, 3 dangling. r0 = 1/3 each; after one round:
    // r(1) = 0.05 + 0.85*(0 + r0/3)          (dangling mass only)
    // r(2) = r(3) = 0.05 + 0.85*(r0 + r0/3)
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, "src", "dst", "w", iters = 1)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r0 = BigDecimal(1.0 / 3).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rnd(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp1 = rnd((1.0 - 0.85) / 3 + 0.85 * (r0 / 3))
    val exp23 = rnd((1.0 - 0.85) / 3 + 0.85 * (r0 + r0 / 3))
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(math.abs(got(0)._2 - exp1) < 1e-12)
    assert(math.abs(got(1)._2 - exp23) < 1e-12)
    assert(math.abs(got(2)._2 - exp23) < 1e-12)
  }

  test("pageRank: mass conserves across rounds (sums to 1)") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 1L), (3L, 1L, 2L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    for (k <- 1 to 4) {
      val total = Graph.pageRank(edges, "src", "dst", "w", iters = k)
        .agg(sum(col("r"))).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"iter $k mass $total")
    }
  }

  test("pageRank: weighted edges shift rank toward the heavy target") {
    // 1 sends 9/10 of its mass to 2, 1/10 to 3; 2 and 3 return to 1
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRank(edges, "src", "dst", "w", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(2L) > r(3L))
    assert(r(1L) > r(2L)) // everyone feeds 1
  }

  test("labelPropagation: two heavy cliques with a weak bridge settle to two communities") {
    // triangle {1,2,3} and triangle {4,5,6} with weight-10 edges,
    // bridged by a weight-1 edge 3–4: the bridge must not merge them.
    val edges = Seq(
      (1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),
      (4L, 5L, 10L), (4L, 6L, 10L), (5L, 6L, 10L),
      (3L, 4L, 1L)
    ).toDF("a", "b", "w")
    val got = Graph.labelPropagation(edges, "a", "b", "w", rounds = 3)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(got(1L), got(2L), got(3L)).size == 1, "left clique unified")
    assert(Set(got(4L), got(5L), got(6L)).size == 1, "right clique unified")
    assert(got(1L) != got(4L), "bridge must not merge the cliques")
  }

  test("labelPropagation: ties resolve to the smallest label deterministically") {
    // node 3 sees labels 1 and 2 with EQUAL weight → adopts 1
    val edges = Seq((1L, 3L, 5L), (2L, 3L, 5L)).toDF("a", "b", "w")
    val got = Graph.labelPropagation(edges, "a", "b", "w", rounds = 1)
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(got(3L) == 1L)
  }
}

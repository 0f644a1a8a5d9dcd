package graft

import org.apache.spark.sql.functions._

import graft.ext.NearDup

/** NearDup.connectedComponents: multi-round propagation (chains longer
  * than one hop), component separation, and the convergence guard.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    NearDup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("chain needs multiple propagation rounds; min id wins") {
    // 7-5-3-1 chain given in an order where labels must travel 3 hops
    val labels = cc(Seq((5L, 7L), (3L, 5L), (1L, 3L)))
    assert(labels === Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 1L))
  }

  test("disjoint components stay separate; singletons not emitted") {
    val labels = cc(Seq((10L, 20L), (2L, 4L), (4L, 6L)))
    assert(labels === Map(10L -> 10L, 20L -> 10L, 2L -> 2L, 4L -> 2L, 6L -> 2L))
  }

  test("cycle converges") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("non-convergence within maxIter throws rather than returning wrong labels") {
    val edges = (1L to 12L).sliding(2).map(p => (p(0), p(1))).toSeq
    intercept[IllegalStateException] {
      NearDup.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter = 2)
        .collect()
    }
  }
}

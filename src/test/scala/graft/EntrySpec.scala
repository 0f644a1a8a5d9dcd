package graft

/** The driver's t1 smoke gate, pinned locally: the flagship query
  * returns rows with the expected shape on sf0.001.
  */
class EntrySpec extends SparkSpec {

  test("entry(): flagship returns ranked revenue rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq ==
      Seq("n_name", "revenue_cents", "n_lineitems", "rank"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // ranks are 1..n in order, revenue non-increasing
    val ranks = rows.map(_.getAs[Int]("rank"))
    assert(ranks.toSeq == (1 to rows.length).toSeq)
    val rev = rows.map(_.getAs[Long]("revenue_cents"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("every oracle key has a matching query key") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}

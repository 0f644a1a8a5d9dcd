package graft

import org.apache.spark.sql.functions._

/** The r12 unification contract (VERDICT-r11 #4): ops.ExtremaIvm is the
  * ONE support-at-extremum algebra — the batch Column derivation
  * (q339/q347's supportView) and the scalar half ExtremaView's
  * processor folds per group must AGREE. This spec replays seeded
  * random delta scenarios through both forms and pins, per group:
  * the rescan flags equal the scalar trigger, the emitted extrema
  * equal the scalar derivation, and both equal the brute recompute
  * over the post-batch multiset (the correctness theorem the trigger
  * exists to preserve).
  */
class ExtremaIvmSpec extends SparkSpec {

  test("batch supportView flags and extrema equal the scalar algebra " +
      "(foldMax/foldMin/exhausted) and the brute post-batch recompute " +
      "across seeded random delete/insert scenarios") {
    import spark.implicits._
    import graft.ops.ExtremaIvm
    val rnd = new scala.util.Random(4712)
    for (round <- 0 until 20) {
      // per group: a small base multiset with repeated values (support
      // > 1 at extrema must arise), a delete subset, an insert batch
      val groups = ('a' to 'e').map(_.toString)
      val base = groups.flatMap { g =>
        (0 until 3 + rnd.nextInt(6)).map(_ => (g, (rnd.nextInt(6) * 10).toLong))
      }
      val del = groups.flatMap { g =>
        val mine = base.filter(_._1 == g)
        rnd.shuffle(mine).take(rnd.nextInt(mine.size + 1))
      }
      val ins = groups.flatMap { g =>
        (0 until rnd.nextInt(3)).map(_ => (g, (rnd.nextInt(8) * 10).toLong))
      }
      // post = base − del (multiset) + ins
      val post = groups.flatMap { g =>
        val counts = scala.collection.mutable.Map[Long, Int]()
        base.filter(_._1 == g).foreach(r =>
          counts(r._2) = counts.getOrElse(r._2, 0) + 1)
        del.filter(_._1 == g).foreach(r =>
          counts(r._2) = counts.getOrElse(r._2, 0) - 1)
        counts.toSeq.flatMap { case (v, c) => Seq.fill(math.max(c, 0))((g, v)) }
      } ++ ins
      val got = ExtremaIvm.supportView(
          base.toDF("g", "cents"), ins.toDF("g", "cents"),
          del.toDF("g", "cents"), post.toDF("g", "cents"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getBoolean(4)))).toMap
      for (g <- groups) {
        val b = base.filter(_._1 == g).map(_._2)
        val d = del.filter(_._1 == g).map(_._2)
        val i = ins.filter(_._1 == g).map(_._2)
        val p = post.filter(_._1 == g).map(_._2)
        // scalar prediction via the shared algebra
        val (mx0, mn0) = (b.max, b.min)
        val exMx = ExtremaIvm.exhausted(
          b.count(_ == mx0).toLong, d.count(_ == mx0).toLong)
        val exMn = ExtremaIvm.exhausted(
          b.count(_ == mn0).toLong, d.count(_ == mn0).toLong)
        if ((exMx || exMn) && p.isEmpty) {
          // trigger fired, nothing to rescan: the group vanishes
          assert(!got.contains(g), s"round $round: emptied $g emitted")
        } else {
          val (gm, gn, fMx, fMn) = got(g)
          assert(fMx == exMx && fMn == exMn,
            s"round $round $g: flags ($fMx,$fMn) != scalar ($exMx,$exMn)")
          val insMax = if (i.isEmpty) Long.MinValue else i.max
          val insMin = if (i.isEmpty) Long.MaxValue else i.min
          val wantMx = if (exMx) p.max else ExtremaIvm.foldMax(mx0, insMax)
          val wantMn = if (exMn) p.min else ExtremaIvm.foldMin(mn0, insMin)
          assert(gm == wantMx && gn == wantMn,
            s"round $round $g: extrema ($gm,$gn) != scalar ($wantMx,$wantMn)")
          // and the theorem: the view equals the brute recompute —
          // EXCEPT insert-only extrema moves where base is untouched
          // (fold is exact there too, so this is the same assertion)
          assert(gm == p.max && gn == p.min,
            s"round $round $g: ($gm,$gn) != brute (${p.max},${p.min})")
        }
      }
    }
  }

  test("supportView domain is BASE groups only (ADVICE-r12): a group " +
      "appearing only in ins is dropped — the documented contract the " +
      "batch adopters rely on, unlike ExtremaView's new-key state") {
    import spark.implicits._
    import graft.ops.ExtremaIvm
    // base has groups a,b; the batch inserts into b AND a brand-new
    // group z (never in base); post reflects all three
    val base = Seq(("a", 10L), ("a", 20L), ("b", 30L))
    val ins = Seq(("b", 40L), ("z", 99L), ("z", 5L))
    val del = Seq.empty[(String, Long)]
    val post = base ++ ins
    val got = ExtremaIvm.supportView(
        base.toDF("g", "cents"), ins.toDF("g", "cents"),
        del.toDF("g", "cents"), post.toDF("g", "cents"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // base groups maintained exactly (b's max folds the insert)
    assert(got("a") == ((20L, 10L)))
    assert(got("b") == ((40L, 30L)))
    // the ins-only group is DROPPED, not emitted with NULL/garbage —
    // callers with new-key batches must handle them (scaladoc)
    assert(!got.contains("z"),
      s"ins-only group escaped the base-groups-only domain: $got")
  }
}

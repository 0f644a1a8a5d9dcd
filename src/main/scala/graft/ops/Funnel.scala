package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream
  * (SURVEY.md §2.14 EXT — the product-analytics siblings of the
  * sessionization family, q21/q22).
  *
  * Scale design: every step is a user-keyed aggregate or equi-join, so
  * the whole chain shuffles on ONE key (user) and co-partitions across
  * stages; per-stage state is a single timestamp per user, never an
  * event list. The final per-stage/per-cohort rollups are aggregates
  * over user-level rows — tiny relative to the event log.
  */
object Funnel {

  /** Ordered-stage funnel: a user reaches stage i when an event of
    * `stages(i)` exists STRICTLY after their earliest stage-(i−1)
    * reach time (first stage: any matching event). Returns one row per
    * stage: `stage_idx`, `stage`, `n_users`, and `conv` (share of the
    * previous stage's users, null for the first stage).
    */
  def funnel(events: DataFrame, userCol: Column, typeCol: Column,
             tsCol: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(userCol.as("__u"), typeCol.as("__t"),
      tsCol.as("__ts"))
    // reach(i): (user, earliest time stage i was reached)
    val reaches = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val evs = base.filter(col("__t") === stage)
        val reached = prev match {
          case None => evs
          case Some(p) => evs.join(p.select(col("__u"),
              col("__reach").as("__prev")), Seq("__u"))
            .filter(col("__ts") > col("__prev"))
        }
        Some(reached.groupBy(col("__u"))
          .agg(min(col("__ts")).as("__reach")))
    }.flatten
    val perStage = reaches.zip(stages.zipWithIndex).map {
      case (r, (stage, i)) =>
        r.select(lit(i).as("stage_idx"), lit(stage).as("stage"),
          col("__u"))
    }.reduce(_.unionByName(_))
    // stage spine: an unreached stage must still report n_users = 0,
    // not vanish from the aggregate
    val spark = events.sparkSession
    import spark.implicits._
    val spine = stages.zipWithIndex.map { case (st, i) => (i, st) }
      .toDF("stage_idx", "stage")
    // the lag window is over K stage rows (a handful) — single
    // partition by construction, not a scale concern
    val w = Window.orderBy(col("stage_idx"))
    spine.join(perStage.groupBy(col("stage_idx"), col("stage"))
        .agg(count(lit(1)).as("n_users")),
      Seq("stage_idx", "stage"), "left")
      .withColumn("n_users", coalesce(col("n_users"), lit(0L)))
      .withColumn("conv",
        round(col("n_users").cast("double") /
          lag(col("n_users"), 1).over(w), 4))
  }

  /** Cohort retention: cohort = each user's first active day; for every
    * requested day `offset`, the count of cohort users active exactly
    * `cohortDay + offset`. Returns one row per cohort day:
    * `cohort_day`, `n_users`, and `n_off_<o>` per offset.
    *
    * `dayCol` must be an integer day number (e.g. epoch-nanos div
    * 86 400e9) — integer arithmetic end to end, no timezone semantics.
    */
  def retentionCohorts(events: DataFrame, userCol: Column, dayCol: Column,
                       offsets: Seq[Int]): DataFrame = {
    val actives = events.select(userCol.as("__u"), dayCol.as("__d"))
      .distinct()
    val cohorts = actives.groupBy(col("__u"))
      .agg(min(col("__d")).as("__cd"))
    val joined = actives.join(cohorts, Seq("__u"))
      .withColumn("__off", col("__d") - col("__cd"))
    // distinct (user, day) upstream makes each (user, offset) unique,
    // so per-user max-flags then per-cohort sums ARE distinct-user counts
    val hits = offsets.map(o =>
      max(when(col("__off") === o, 1L).otherwise(0L)).as(s"__h_$o"))
    joined.groupBy(col("__u"), col("__cd"))
      .agg(hits.head, hits.tail: _*)
      .groupBy(col("__cd").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        offsets.map(o => sum(col(s"__h_$o")).as(s"n_off_$o")): _*)
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native as-of join — the whole-operator tier of custom extension
  * (SURVEY.md §2.13, preference ladder (c)): a join-condition marker
  * expression, a planner strategy, and a merge-scan physical operator,
  * wired through PUBLIC hooks only (`spark.experimental.extraStrategies`
  * / `SparkSessionExtensions.injectPlannerStrategy` — consistent with
  * SURVEY §4's stay-public decision).
  *
  * Semantics (matches [[graft.ops.AsOf.asofJoin]], the union+window
  * formulation): for each left row, the single most recent right row of
  * the same key with `right.time <= left.time`; ties on time break by
  * the larger right tie column; unmatched left rows survive with nulls
  * (left-outer).
  *
  * Why a physical operator: the union+window plan pays one shuffle of
  * left+right PLUS a full window materialization (every right column
  * carried through last_value state per window frame). The merge scan
  * pays the same single co-partitioning exchange but then streams both
  * sorted sides with O(1) state per key — one buffered right row — and
  * never widens rows before the join point. Same exchange count,
  * strictly less memory and no window state, which is what matters when
  * both sides are 100 TB facts.
  */
object AsOfJoin {

  /** Marker join condition: `graft_asof_on(lKey, rKey, lTime, rTime,
    * lTie, rTie)`. Carries the six column roles through analysis; it is
    * never evaluated — [[AsOfJoinStrategy]] pattern-matches it out of a
    * LEFT OUTER join and plans [[AsOfJoinExec]]. Executing a plan that
    * still contains it (strategy not installed) fails with an
    * instructive error instead of silently computing something else.
    */
  case class AsOfOn(leftKey: Expression, rightKey: Expression,
                    leftTime: Expression, rightTime: Expression,
                    leftTie: Expression, rightTie: Expression)
    extends Expression {

    override def children: Seq[Expression] =
      Seq(leftKey, rightKey, leftTime, rightTime, leftTie, rightTie)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false

    private def sameType(a: DataType, b: DataType): Boolean =
      DataType.equalsStructurally(a, b, ignoreNullability = true)

    override def checkInputDataTypes(): TypeCheckResult =
      if (!sameType(leftKey.dataType, rightKey.dataType))
        TypeCheckResult.TypeCheckFailure(
          s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
      else if (!sameType(leftTime.dataType, rightTime.dataType))
        TypeCheckResult.TypeCheckFailure(
          s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
      else TypeCheckResult.TypeCheckSuccess

    private def unsupported: Nothing =
      throw new UnsupportedOperationException(
        "graft_asof_on is a join-condition marker for as-of joins; the plan " +
          "must be planned by graft.plans.AsOfJoinStrategy (installed by " +
          "AsOf.asofJoinNative, spark.experimental.extraStrategies, or " +
          "spark.sql.extensions=graft.GraftExtensions) and the marker must " +
          "be the ENTIRE condition of a LEFT OUTER join")
    override def eval(input: InternalRow): Any = unsupported
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      unsupported

    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(c(0), c(1), c(2), c(3), c(4), c(5))
  }

  /** Plans `Join(l, r, LeftOuter, AsOfOn, _)` into [[AsOfJoinExec]].
    * Anything else falls through to the built-in strategies.
    */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Join(l, r, LeftOuter, Some(c: AsOfOn), _) =>
        AsOfJoinExec(planLater(l), planLater(r), c) :: Nil
      case _ => Nil
    }
  }

  /** Sorted merge scan over co-partitioned children.
    *
    * Requirements declared, not hand-built: `ClusteredDistribution` on
    * each side's key (EnsureRequirements inserts ONE co-partitioning
    * exchange pair, exactly like sort-merge join) and per-partition
    * ordering (key, time, tie) ascending (EnsureRequirements inserts
    * the sorts). The merge then holds ONE buffered right row: because
    * both sides arrive key-then-time sorted, the "most recent right row
    * ≤ t" is simply the last right row consumed while advancing the
    * right pointer to t — O(left + right) per partition, O(1) state,
    * no per-key grouping or window buffer.
    *
    * Output ordering/partitioning are preserved from the left child, so
    * downstream per-key operators reuse the exchange. Interpreted row
    * access (no codegen) — the per-row work is two field reads and a
    * compare; the operator exists to kill the window state, not to
    * win expression-eval microseconds.
    */
  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan, cond: AsOfOn)
    extends SparkPlan with BinaryExecNode {

    override lazy val metrics: Map[String, SQLMetric] = Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
        "number of output rows"),
      "numMatched" -> SQLMetrics.createMetric(sparkContext,
        "number of left rows with an as-of match"))

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(cond.leftKey)) ::
        ClusteredDistribution(Seq(cond.rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(cond.leftKey, Ascending),
        SortOrder(cond.leftTime, Ascending),
        SortOrder(cond.leftTie, Ascending)),
      Seq(SortOrder(cond.rightKey, Ascending),
        SortOrder(cond.rightTime, Ascending),
        SortOrder(cond.rightTie, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    protected override def doExecute(): RDD[InternalRow] = {
      val lKey = BindReferences.bindReference(cond.leftKey, left.output)
      val lTime = BindReferences.bindReference(cond.leftTime, left.output)
      val rKey = BindReferences.bindReference(cond.rightKey, right.output)
      val rTime = BindReferences.bindReference(cond.rightTime, right.output)
      val keyOrd = TypeUtils.getInterpretedOrdering(cond.leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(cond.leftTime.dataType)
      val rightWidth = right.output.size
      val outRows = longMetric("numOutputRows")
      val matchedRows = longMetric("numMatched")
      // bind the projection against the NULLABLE output schema (not the
      // raw right attributes): unmatched left rows feed an all-null
      // right row, and a projection built on non-nullable inputs would
      // elide the null checks and read zeros
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightWidth)
        val rBuf = rIter.buffered
        // the single buffered "most recent right row"; valid only while
        // bestKey equals the current left key
        var best: InternalRow = null
        var bestKey: Any = null
        lIter.map { lRow =>
          val lk = lKey.eval(lRow)
          val lt = lTime.eval(lRow)
          if (lk != null) {
            var advance = true
            while (advance && rBuf.hasNext) {
              val head = rBuf.head
              val rk = rKey.eval(head)
              if (rk == null) { rBuf.next() } // null keys match nothing
              else {
                val cmp = keyOrd.compare(rk, lk)
                if (cmp < 0) { rBuf.next() } // earlier key: skip past
                else if (cmp > 0 || lt == null) { advance = false }
                else {
                  val rt = rTime.eval(head)
                  if (rt == null) { rBuf.next() } // null time: unmatched
                  else if (timeOrd.compare(rt, lt) <= 0) {
                    // consume and remember: sorted (time, tie) ascending
                    // means the LAST consumed row is the match
                    best = rBuf.next().copy()
                    bestKey = lk
                  } else advance = false
                }
              }
            }
          }
          val matched = lk != null && bestKey != null &&
            keyOrd.compare(bestKey, lk) == 0
          outRows += 1
          if (matched) matchedRows += 1
          proj(joined(lRow, if (matched) best else nullRight))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)
  }
}

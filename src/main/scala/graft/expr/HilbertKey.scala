package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve key (SURVEY.md §2.13 expression family):
  * `graft_hilbert(x, y)` at a fixed order — the space-filling layout
  * key beside [[ZOrderKey]]. Hilbert preserves locality strictly
  * better than Morton (consecutive keys are ALWAYS grid neighbors — no
  * Z-shaped jumps), which is what you want when range-scanning a
  * latitude/longitude-sorted table: a contiguous key range maps to a
  * compact spatial blob, so partition pruning on the key prunes space.
  *
  * Classic iterative xy2d: per level, take the quadrant
  * `(3·rx) XOR ry`, then flip+swap the frame (the rotation that makes
  * the curve continuous). Codegen'd via a static helper call, same as
  * [[GeohashEncode]]; the DuckDB oracle replays the identical integer
  * recurrence as a per-level recursive CTE.
  */
case class HilbertKey(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31, s"hilbert order $order not in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  protected override def nullSafeEval(x: Any, y: Any): Any =
    HilbertKey.xy2d(order, x.asInstanceOf[Long], y.asInstanceOf[Long])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expr.HilbertKey.xy2d($order, $x, $y);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object HilbertKey {

  /** Iterative Hilbert xy2d; inputs masked to `order` bits (matching
    * the oracle's base-case mask).
    */
  def xy2d(order: Int, xIn: Long, yIn: Long): Long = {
    val mask = (1L << order) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate: conditional flip, then swap axes
        val (fx, fy) = if (rx == 1) (s - 1 - x, s - 1 - y) else (x, y)
        x = fy
        y = fx
      }
      s >>= 1
    }
    d
  }

  /** DuckDB oracle: the same recurrence as a recursive CTE stepping one
    * level per round over `srcCte(idCol, xCol, yCol)`. Emits a CTE body;
    * the caller selects `id, d FROM <name> WHERE s = 0`.
    */
  def recursiveSql(name: String, srcCte: String, idCol: String,
                   xCol: String, yCol: String, order: Int): String = {
    val mask = (1L << order) - 1
    val s0 = 1L << (order - 1)
    s"""$name(id, s, x, y, d) AS (
       |  SELECT $idCol, CAST($s0 AS BIGINT), $xCol & $mask,
       |    $yCol & $mask, CAST(0 AS BIGINT)
       |  FROM $srcCte
       |  UNION ALL
       |  SELECT id, s // 2,
       |    CASE WHEN (y & s) = 0 THEN
       |      (CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END)
       |      ELSE x END,
       |    CASE WHEN (y & s) = 0 THEN
       |      (CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END)
       |      ELSE y END,
       |    d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
       |      CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)
       |  FROM $name WHERE s >= 1)""".stripMargin
  }
}

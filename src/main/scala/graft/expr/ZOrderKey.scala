package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Z-order (Morton) curve key: interleaves the low `bits` bits
  * of two long dimensions into one clustering key. Sorting/range-
  * partitioning a table by `zkey` co-locates rows that are close in
  * BOTH dimensions, so parquet row-group min/max stats prune 2-D
  * predicates (user × time, key × date) that a single-column sort
  * layout cannot — the multi-dimensional sibling of the q80 layout.
  *
  * Codegen'd bit loop, no allocation; inputs are masked to `bits` so
  * callers need not pre-mod. 2·bits ≤ 63 keeps the key in a positive
  * long (bits = 16 → 32-bit keys).
  */
case class ZOrderKey(left: Expression, right: Expression, bits: Int = 16)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_zorder"

  private val mask: Long = (1L << bits) - 1

  protected override def nullSafeEval(x: Any, y: Any): Any = {
    val a = x.asInstanceOf[Long] & mask
    val b = y.asInstanceOf[Long] & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  // NOTE: no parenthesized arithmetic directly after `<<` — Janino
  // misparses `x << (2 * i)` as a cast ("expression is not a type")
  // and the whole projection silently falls back to interpreted eval;
  // the shift amount therefore lives in its own local.
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val sh = ctx.freshName("sh")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long ${ev.value}_acc = 0L;
         |int $sh = 0;
         |for (int $i = 0; $i < $bits; $i++) {
         |  ${ev.value}_acc |= (($x >> $i) & 1L) << $sh;
         |  $sh++;
         |  ${ev.value}_acc |= (($y >> $i) & 1L) << $sh;
         |  $sh++;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization kernels (SURVEY.md §2.14 ANN family; the
  * memory-side scale path: at 100 TB an encoded corpus carries `m`
  * small ints per vector instead of `dim` floats — a 32× scan-volume
  * reduction at m=8/dim=64 — and the codebook rides into every
  * executor as a foldable literal, KBs like any broadcast dim).
  *
  * The codebook argument must be a FOLDABLE `array<array<array<float>>>`
  * literal of shape m × k × (dim/m), trained driver-side
  * (graft.ext.Similarity.pqTrain) — same split as IVF's coarse
  * quantizer: heavy per-row math distributed, tiny model on the driver.
  */
object ProductQuant {
  /** Materialize the m×k×dsub codebook from a foldable literal. */
  def codebookOf(e: Expression): Array[Array[Array[Float]]] = {
    require(e.foldable, "PQ codebook must be a foldable literal")
    val m = e.eval().asInstanceOf[ArrayData]
    (0 until m.numElements()).map { s =>
      val ks = m.getArray(s)
      (0 until ks.numElements()).map { j =>
        ks.getArray(j).toFloatArray()
      }.toArray
    }.toArray
  }
}

/** `graft_pq_encode(vec, codebook)` → array<int> of m codes: per
  * subspace, the index of the L2-nearest codeword (ties → lowest
  * index). One narrow fused pass — the corpus-encoding scan.
  */
case class PqEncode(vec: Expression, codebook: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, codebook.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<array<array<float>>>), " +
          s"got ${a.sql} and ${b.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val cb = ProductQuant.codebookOf(codebook)

  def compute(v: ArrayData): ArrayData = {
    val m = cb.length
    val codes = new Array[Int](m)
    var off = 0
    var s = 0
    while (s < m) {
      val ks = cb(s)
      val dsub = ks(0).length
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ks.length) {
        val c = ks(j)
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = v.getFloat(off + t).toDouble - c(t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      off += dsub
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqenc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, codebook = newRight)
}

/** `graft_pq_adc(codes, qvec, codebook)` → double: asymmetric
  * (query-to-codeword) squared L2 distance, Σₛ ‖qₛ − cb[s][codeₛ]‖².
  * Per-pair cost is `dim` multiply-adds here; a production scan with
  * many corpus rows per query amortizes this to m table lookups by
  * precomputing the per-query m×k LUT — the math (and result) is
  * identical, so the harness-scale form stays oracle-comparable.
  */
case class PqAdcDistance(codes: Expression, qvec: Expression,
                         codebook: Expression) extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = qvec
  override def third: Expression = codebook

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, qvec.dataType, codebook.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<float>, " +
          s"array<array<array<float>>>), got ${a.sql}, ${b.sql}, ${c.sql}")
    }

  override def dataType: DataType = DoubleType

  @transient private lazy val cb = ProductQuant.codebookOf(codebook)

  def compute(codes: ArrayData, q: ArrayData): Double = {
    var d = 0.0
    var off = 0
    var s = 0
    while (s < cb.length) {
      val c = cb(s)(codes.getInt(s))
      var t = 0
      while (t < c.length) {
        val diff = q.getFloat(off + t).toDouble - c(t)
        d += diff * diff
        t += 1
      }
      off += c.length
      s += 1
    }
    d
  }

  override def nullSafeEval(c: Any, q: Any, b: Any): Any =
    compute(c.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqadc", this, classOf[PqAdcDistance].getName)
    nullSafeCodeGen(ctx, ev, (a, b, _) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(codes = newFirst, qvec = newSecond, codebook = newThird)
}

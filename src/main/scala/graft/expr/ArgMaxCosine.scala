package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: index of the centroid (a FOLDABLE
  * `array<array<float>>` literal) with the highest cosine similarity to
  * the row's vector; ties break to the lowest index.
  *
  * This is the IVF coarse-quantizer assignment as a NARROW map: the
  * centroid matrix is decoded from the literal once per JVM and each row
  * costs one fused nlist×dim pass — no corpus×centroids join, no
  * shuffle, no per-row allocation. The join+window formulation it
  * replaces shuffled n×nlist rows to rank them; at corpus scale that
  * shuffle dominated the whole IVF build.
  */
case class ArgMaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, foldable array<array<float>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = IntegerType

  /** Centroid matrix decoded once per executor from the foldable literal
    * (ArrayData traversal per row would re-box every element).
    */
  @transient private lazy val mat: Array[Array[Float]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toFloatArray()
    }
  }

  override def nullSafeEval(v: Any, ignored: Any): Any =
    ArgMaxCosine.compute(v.asInstanceOf[ArrayData], mat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("cmat", mat, "float[][]")
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expr.ArgMaxCosine$$.MODULE$$.compute($a, $matRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArgMaxCosine {

  /** Fused argmax pass. Cosine denominators share the row norm, so the
    * comparison uses dot/‖c‖ (the row norm scales every candidate
    * equally and is skipped); centroid norms are recomputed per call on
    * a dim-bounded loop — cheap relative to the dot products and free of
    * shared mutable state.
    */
  def compute(vec: ArrayData, mat: Array[Array[Float]]): Int = {
    // -1 would flow silently into downstream equi-joins as a phantom
    // list id: an empty matrix is a caller configuration error (fail
    // fast); if every centroid has zero norm (all scores -Inf) the
    // deterministic fallback is index 0, never an invalid index.
    require(mat.length > 0, "argmax over an empty centroid matrix")
    val n = vec.numElements()
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < mat.length) {
      val row = mat(c)
      val m = math.min(n, row.length)
      var dot = 0.0
      var nc = 0.0
      var j = 0
      while (j < m) {
        val cv = row(j).toDouble
        dot += vec.getFloat(j).toDouble * cv
        nc += cv * cv
        j += 1
      }
      val score = if (nc == 0.0) Double.NegativeInfinity else dot / math.sqrt(nc)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }
}

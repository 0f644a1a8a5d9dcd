package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the `nPlanes` random-hyperplane sign bits
  * of an `array<float>` vector, packed into one long — the LSH bucket id
  * for cosine-similarity search (SURVEY.md §2.14).
  *
  * Replaces the higher-order formulation (one interpreted
  * `aggregate(zip_with(...))` per plane per row, the known ~1 ms/doc HOF
  * trap): hyperplane components depend only on (plane, dimension), so
  * they are materialized once per JVM into a lookup table and each row
  * costs one fused nPlanes×dim multiply-accumulate loop with zero
  * allocation.
  *
  * Bit-for-bit identical to the HOF form (pinned in SimilaritySpec):
  * component(p, j) = pmod(xxhash64("plane", p, j), 20000)/10000 − 1,
  * same left-to-right double accumulation, bit p set iff the dot is > 0.
  * Sole divergence: a NULL vector yields NULL here, where the HOF form's
  * `when(d > 0, ...).otherwise(0)` collapses NULL to bucket 0.
  */
case class HyperplaneSignBits(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nPlanes >= 1 && nPlanes <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and 1 <= nPlanes <= 63, " +
        s"got ${child.dataType.sql} with nPlanes=$nPlanes")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    HyperplaneSignBits.compute(v.asInstanceOf[ArrayData], nPlanes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.HyperplaneSignBits$$.MODULE$$.compute($a, $nPlanes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignBits {

  private val PlaneTag = UTF8String.fromString("plane")

  /** Same value the HOF form computes per element: xxhash64 (seed 42)
    * over ("plane", p, j) mapped to [-1, 1) with pmod/20000.
    */
  private def component(p: Int, j: Int): Double = {
    var h = XxHash64Function.hash(PlaneTag, StringType, 42L)
    h = XxHash64Function.hash(p, IntegerType, h)
    h = XxHash64Function.hash(j, IntegerType, h)
    (java.lang.Math.floorMod(h, 20000L).toDouble / 10000.0) - 1.0
  }

  // comps(p)(j), grown on demand to the largest (nPlanes, dim) seen.
  // Volatile snapshot + synchronized regrow: readers never block, the
  // table is tiny (nPlanes × dim doubles) and write-once per size.
  @volatile private var comps: Array[Array[Double]] = Array.empty

  private def ensure(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val t = comps
    if (t.length >= nPlanes && (t.length == 0 || t(0).length >= dim)) t
    else synchronized {
      val cur = comps
      if (cur.length >= nPlanes && (cur.length == 0 || cur(0).length >= dim)) cur
      else {
        val np = math.max(cur.length, nPlanes)
        val nd = math.max(if (cur.isEmpty) 0 else cur(0).length, dim)
        val grown = Array.tabulate(np, nd)(component)
        comps = grown
        grown
      }
    }
  }

  /** One fused pass: nPlanes dot products against the cached component
    * table, sign bit p set iff dot(p) > 0. Called from generated code.
    */
  def compute(vec: ArrayData, nPlanes: Int): Long = {
    val n = vec.numElements()
    val t = ensure(nPlanes, n)
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      val row = t(p)
      var d = 0.0
      var j = 0
      while (j < n) {
        d += vec.getFloat(j).toDouble * row(j)
        j += 1
      }
      if (d > 0) bits |= 1L << p
      p += 1
    }
    bits
  }
}

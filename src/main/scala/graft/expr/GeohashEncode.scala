package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native base-32 geohash encoder (SURVEY.md §2.14 EXT geo family):
  * `graft_geohash(lat, lon, precision)` → the standard Niemeyer geohash
  * string (alphabet `0123456789bcdefghjkmnpqrstuvwxyz`, longitude bit
  * first). Spark ships no geohash; this is the spatial bucketing key
  * for prefix-range scans and cell joins at scale (a geohash prefix IS
  * a grid cell, so `substr(gh, 1, k)` group-bys are the heatmap /
  * bucket-join key without recomputing floors).
  *
  * Quantization is the closed form of the textbook bisection:
  * `lonQ = floor((lon + 180) / 360 * 2^ceil(5p/2))`,
  * `latQ = floor((lat + 90) / 180 * 2^floor(5p/2))`, bits interleaved
  * lon-first. The arithmetic is spelled in exactly this operation
  * order so a SQL oracle using the same spelling produces identical
  * doubles, hence identical cells, on any IEEE-754 engine.
  *
  * Codegen'd via a static helper call — no UDF boundary, stays inside
  * whole-stage codegen (CodegenCompileSpec sweeps it).
  */
case class GeohashEncode(lat: Expression, lon: Expression, prec: Expression)
    extends TernaryExpression {

  override def first: Expression = lat
  override def second: Expression = lon
  override def third: Expression = prec

  override def checkInputDataTypes(): TypeCheckResult =
    (lat.dataType, lon.dataType, prec.dataType) match {
      case _ if !prec.foldable => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal precision")
      case (DoubleType, DoubleType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, double, int), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_geohash"

  protected override def nullSafeEval(la: Any, lo: Any, p: Any): Any =
    UTF8String.fromString(GeohashEncode.encode(
      la.asInstanceOf[Double], lo.asInstanceOf[Double], p.asInstanceOf[Int]))

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo, p) => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.expr.GeohashEncode.encode($la, $lo, $p));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(lat = f, lon = s, prec = t)
}

object GeohashEncode {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Closed-form encode; `prec` in 1..12 (12 → 60 bits, fits a Long).
    * Inputs outside [-90, 90] / [-180, 180) clamp to the last cell,
    * matching the bisection's behavior for lat/lon == +90/+180.
    */
  def encode(lat: Double, lon: Double, prec: Int): String = {
    val p = math.max(1, math.min(12, prec))
    val bits = 5 * p
    val lonBits = (bits + 1) / 2 // lon gets the extra bit (lon-first)
    val latBits = bits / 2
    val lonQ = clampQ(math.floor((lon + 180.0) / 360.0 * (1L << lonBits)),
      lonBits)
    val latQ = clampQ(math.floor((lat + 90.0) / 180.0 * (1L << latBits)),
      latBits)
    // Interleave lon-first from the MSB. With an odd bit total (odd
    // precision) the LSB is a lon bit → lon bit i sits at code bit 2i;
    // with an even total the LSB is a lat bit → the slots flip.
    val lonShiftAdd = if (bits % 2 == 1) 0 else 1
    var code = 0L
    var i = 0
    while (i < lonBits) {
      code |= ((lonQ >> i) & 1L) << (2 * i + lonShiftAdd); i += 1
    }
    var j = 0
    while (j < latBits) {
      code |= ((latQ >> j) & 1L) << (2 * j + 1 - lonShiftAdd); j += 1
    }
    val sb = new java.lang.StringBuilder(p)
    var c = p - 1
    while (c >= 0) {
      sb.append(Alphabet.charAt(((code >> (5 * c)) & 31L).toInt))
      c -= 1
    }
    sb.toString
  }

  private def clampQ(q: Double, nBits: Long): Long = {
    val max = (1L << nBits) - 1
    if (q < 0) 0L else if (q > max) max else q.toLong
  }

  /** DuckDB spellings of the same encode for a FIXED precision — the
    * oracle half, generated (25+ bit-shift terms for p=5) rather than
    * hand-written. The oracle query stages these through CTEs:
    * quantization (identical double arithmetic) → bit interleave →
    * base-32 char picks via `substr`.
    */
  def quantLonSql(lonSql: String, prec: Int): String = {
    val lonBits = (5 * prec + 1) / 2
    s"CAST(least(${(1L << lonBits) - 1}, greatest(0, " +
      s"floor(($lonSql + 180.0) / 360.0 * ${1L << lonBits}.0))) AS BIGINT)"
  }

  def quantLatSql(latSql: String, prec: Int): String = {
    val latBits = (5 * prec) / 2
    s"CAST(least(${(1L << latBits) - 1}, greatest(0, " +
      s"floor(($latSql + 90.0) / 180.0 * ${1L << latBits}.0))) AS BIGINT)"
  }

  /** Bit-interleave of quantized columns (lon-first), as a SQL sum. */
  def interleaveSql(lonqCol: String, latqCol: String, prec: Int): String = {
    val bits = 5 * prec
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    val add = if (bits % 2 == 1) 0 else 1 // even total: lat takes the LSB
    val lonTerms = (0 until lonBits).map(i =>
      s"((($lonqCol >> $i) & 1) << ${2 * i + add})")
    val latTerms = (0 until latBits).map(j =>
      s"((($latqCol >> $j) & 1) << ${2 * j + 1 - add})")
    (lonTerms ++ latTerms).mkString(" + ")
  }

  /** Base-32 string from the interleaved code column. */
  def charsSql(codeCol: String, prec: Int): String =
    (0 until prec).map { k =>
      val shift = 5 * (prec - 1 - k)
      s"substr('$Alphabet', CAST((($codeCol >> $shift) & 31) AS INTEGER) + 1, 1)"
    }.mkString(" || ")
}

package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused pass: word w-shingles of a token array → xxhash64
  * values (seed 42, byte-identical to the built-in `xxhash64` over the
  * space-joined shingle string). `distinct = true` (default) dedups in
  * first-occurrence order (set semantics for Jaccard/minhash);
  * `distinct = false` keeps the full positional sequence (rolling-hash
  * consumers like winnowing).
  *
  * Replaces `array_distinct(transform(shingles(toks), xxhash64))`:
  * higher-order functions are interpreted per element, so the composed
  * form costs ~1 ms per document — this loop is the near-dup hot path
  * scanned once per corpus row at 100 TB (SURVEY.md §2.14). Documents
  * shorter than `w` tokens hash the whole token sequence as one shingle
  * (same fallback as the composed form).
  */
case class ShingleHashes(child: Expression, w: Int,
                         distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  def compute(toksRaw: ArrayData): ArrayData = {
    val n = toksRaw.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = toksRaw.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val count = if (n < w) 1 else n - w + 1
    val width = if (n < w) n else w
    val out = new Array[Long](count)
    var m = 0
    i = 0
    while (i < count) {
      // hash of the space-joined shingle, identical to
      // xxhash64(concat_ws(" ", toks slice)) — build the joined bytes once
      val parts = new Array[UTF8String](width)
      var j = 0
      while (j < width) { parts(j) = toks(i + j); j += 1 }
      val s = UTF8String.concatWs(space, parts: _*)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      if (distinct) {
        // first-occurrence order; shingle sets are small (≈ token count),
        // so a linear containment scan beats hash-set allocation
        var seen = false
        var k = 0
        while (k < m && !seen) { seen = out(k) == h; k += 1 }
        if (!seen) { out(m) = h; m += 1 }
      } else {
        out(m) = h; m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native fused pass: word w-shingles of a token array as STRINGS, in
  * positional order (no dedup) — value-identical to
  * `transform(sequence(1, n-w+1), i -> concat_ws(" ", toks[i..i+w-1]))`
  * with the same shorter-than-w fallback as [[ShingleHashes]]. Exists for
  * the oracle-checkable fingerprint paths (DuckDB recomputes string
  * shingles exactly; it cannot recompute xxhash64) without paying the
  * interpreted higher-order-function cost per element.
  */
case class WordShingles(child: Expression, w: Int)
    extends UnaryExpression {
  require(w > 0, s"window must be positive, got $w") // same guard as ShingleGenerate

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  def compute(toksRaw: ArrayData): ArrayData = {
    val n = toksRaw.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = toksRaw.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val count = if (n < w) 1 else n - w + 1
    val width = if (n < w) n else w
    val out = new Array[AnyRef](count)
    i = 0
    while (i < count) {
      val parts = new Array[UTF8String](width)
      var j = 0
      while (j < width) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash over pre-hashed tokens: per-bit majority vote
  * (bit b of the result is 1 iff more than half the hashes have bit b
  * set), byte-identical to the composed column form it replaces
  * (64 × `size(filter(hs, …))` interpreted array traversals per row —
  * this is ONE pass: 64 counters bumped per hash). The simhash scan is
  * a per-corpus-row hot loop at 100 TB, same class as [[ShingleHashes]].
  * Null elements count toward n but vote for no bit, matching
  * `size(hs)` / `filter` semantics of the composed form.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= 1L << b
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhasher", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native k-seed minhash signature over pre-hashed shingles: element s of
  * the output is min over the input of xxhash64(h, seed = s) — one tight
  * k×n loop instead of k interpreted array traversals.
  */
case class SeededMinHash(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val sig = new Array[Long](k)
    var s = 0
    while (s < k) {
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = XXH64.hashLong(hs.getLong(i), s.toLong)
        if (h < min) min = h
        i += 1
      }
      sig(s) = min
      s += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhasher", this, classOf[SeededMinHash].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

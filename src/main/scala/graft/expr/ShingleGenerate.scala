package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator (UDTF surface, SURVEY.md §2.13): emits one row per
  * word shingle LAZILY — the streaming sibling of
  * `explode(graft_word_shingles(...))`, which materializes the whole
  * shingle array per document before the Generate unrolls it. For a
  * 100 MB document that array is ~n× the document in fresh garbage;
  * this iterator allocates one shingle at a time and nothing survives
  * the row. Same windowing semantics as [[WordShingles]] (a document
  * shorter than the window yields its whole token list as one
  * shingle), pinned by byte-equality in NearDupSpec.
  *
  * Generators run inside `GenerateExec` (not expression codegen), so
  * `CodegenFallback` here costs nothing extra — the generate operator
  * itself is the loop.
  */
case class ShingleGenerate(child: Expression, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(w > 0, s"window must be positive, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def prettyName: String = "graft_shingle_rows"

  private val space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val toks = child.eval(input).asInstanceOf[ArrayData]
    if (toks == null) return Iterator.empty
    val n = toks.numElements()
    val total = if (n < w) 1 else n - w + 1
    val width = if (n < w) n else w
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < total
      override def next(): InternalRow = {
        val parts = new Array[UTF8String](width)
        var j = 0
        while (j < width) {
          val t = toks.getUTF8String(i + j)
          parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
          j += 1
        }
        i += 1
        InternalRow(UTF8String.concatWs(space, parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

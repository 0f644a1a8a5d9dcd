package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode-normalization expression (NFC/NFD/NFKC/NFKD) for
  * corpus canonicalization: equality-based dedup must not distinguish
  * `é` (U+00E9) from `e`+COMBINING ACUTE — normalize before
  * fingerprinting (see [[graft.ext.Corpus]] leakage/dedup ops).
  *
  * Scale design: the hot path is the `isFullAscii()` short-circuit —
  * ASCII is closed under every normalization form, and real-world
  * corpora are overwhelmingly ASCII bytes, so most rows never pay the
  * String materialization that `java.text.Normalizer` requires. The
  * non-ASCII tail allocates one String per row; still codegen'd
  * (no UDF serialization boundary).
  *
  * Spark itself ships no normalizer; DuckDB's `nfc_normalize` is the
  * oracle counterpart for the NFC form.
  */
case class NfcNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.isFullAscii) s
    else UTF8String.fromString(Normalizer.normalize(s.toString, form))
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val formName = form.name()
      s"""
         |if ($c.isFullAscii()) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($c.toString(),
         |      java.text.Normalizer.Form.$formName));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

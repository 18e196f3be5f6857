package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd Catalyst expression —
  * the canonicalization step every dedup/match key needs before
  * hashing (a decomposed `e`+U+0301 and a precomposed `é` are the
  * SAME text but different bytes, so un-normalized fingerprints split
  * identical documents): NFC/NFD/NFKC/NFKD via the JDK's
  * `java.text.Normalizer` (the Unicode-standard algorithm — DuckDB's
  * `nfc_normalize` implements the same spec, which is what makes the
  * gate oracle exact). Spark has no built-in for this; a Scala UDF
  * would break whole-stage codegen, so this is the (b)-tier custom
  * Expression the brief prescribes: null-safe, fully codegen'd, form
  * validated at construction.
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  // fail at construction, not per row, on a bad form name
  java.text.Normalizer.Form.valueOf(formName)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string input, got ${dt.catalogString}")
  }

  override def dataType: DataType = child.dataType
  override def prettyName: String = "unicode_normalize"

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(formName)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.$formName))")
}

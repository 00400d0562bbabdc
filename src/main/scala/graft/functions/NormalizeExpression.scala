package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the canonical first step of any text-cleaning pipeline
  * (web crawls carry the same grapheme in composed and decomposed
  * forms, which breaks exact dedup, shingle fingerprints, and token
  * counts until the corpus is normalized to one form).
  *
  * Spark has no built-in normalizer, so the alternative is a Scala
  * `udf()` — serialized closure, no codegen, Row boxing. This is a
  * `UnaryExpression` with `doGenCode`, so it inlines into whole-stage
  * codegen like a built-in: the generated code calls one static
  * method wrapping `java.text.Normalizer` (ICU-equivalent tables
  * shipped with the JDK). A fast path skips allocation entirely when
  * the input is already in the target form (`Normalizer.isNormalized`
  * is O(n) with no copy — the common case for ASCII-heavy corpora).
  *
  * Cross-engine contract: DuckDB's `nfc_normalize()` implements the
  * same UAX #15 NFC, which the t34 oracle exercises byte-for-byte via
  * md5 over the normalized UTF-8.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if UnicodeNormalize.forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName form must be one of ${UnicodeNormalize.forms.keys.mkString("/")}, got $form")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.UnicodeNormalize.compute($s, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = s"graft_unicode_normalize_$form"
}

object UnicodeNormalize {

  private[functions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  def compute(s: UTF8String, form: String): UTF8String = {
    val f = forms(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def apply(text: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(text), form))
}

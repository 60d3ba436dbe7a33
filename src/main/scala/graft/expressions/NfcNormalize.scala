package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string column.
  *
  * Spark ships no canonical-composition function, yet it is the first step of
  * every text-cleaning pipeline over web-crawled corpora: the same visible
  * text arrives both composed (U+00E9) and decomposed (U+0065 U+0301), and
  * every downstream fingerprint/dedup/shingle operator treats the two as
  * different documents unless normalized first.
  *
  * Codegen delegates to [[NfcNormalize.normalize]] (a static helper) rather
  * than inlining the ICU-style algorithm — the JDK's `java.text.Normalizer`
  * is the canonical implementation and the call stays inside the
  * whole-stage-codegen pipeline (no UDF boundary, no serialization).
  * Fast path: `Normalizer.isNormalized` avoids allocating for the
  * overwhelmingly-ASCII common case.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

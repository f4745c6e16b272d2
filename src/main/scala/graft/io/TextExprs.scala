package org.apache.spark.sql.graftio

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode text normalization. Spark has no NFC builtin; the JDK's
  * `java.text.Normalizer` is the platform implementation of Unicode
  * canonical composition, wrapped here as a codegen'd expression so it
  * runs inside whole-stage codegen like any other string function
  * (a Scala UDF would break the codegen span and pay ser/de per row).
  *
  * The DuckDB oracle twin is `nfc_normalize()` (utf8proc NFC) — both
  * implement the same Unicode canonical composition algorithm.
  */
object TextNorm {

  /** NFC-normalize; returns the input buffer untouched when the text is
    * already normalized (the overwhelmingly common case for web text —
    * `Normalizer.isNormalized` is a quick-check table scan, no copy). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  final case class NfcNormalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"
    override def nullSafeEval(input: Any): Any =
      nfc(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"org.apache.spark.sql.graftio.TextNorm.nfc($c)")
    override protected def withNewChildInternal(
        newChild: Expression): NfcNormalize = copy(child = newChild)
  }

  def nfcNormalize(c: Column): Column =
    Columns.of(NfcNormalize(Columns.exprOf(c)))
}

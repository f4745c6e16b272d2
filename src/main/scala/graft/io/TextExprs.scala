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

  /** Shannon entropy (bits per character) of the code-point distribution
    * — the "is this text or noise" quality signal (low = repeated
    * characters / binary junk, ~4.1 for English prose). One fused pass
    * per row: count code points into a small open hash, then
    * `-Σ (c/n)·log2(c/n)` — no explode, no per-character rows, no
    * shuffle. A `split`+`groupBy` formulation would shuffle one row PER
    * CHARACTER of the corpus (~6 orders of magnitude more rows at
    * 100 TB). The DuckDB twin unnests `string_split(s, '')` (also code
    * points) and aggregates the same formula. */
  def entropyBits(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1L
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
    }
    if (n == 0L) 0.0
    else {
      val ln2 = math.log(2.0)
      var e = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next()(0).toDouble / n
        e -= p * (math.log(p) / ln2)
      }
      e
    }
  }

  final case class CharEntropy(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType
    override def prettyName: String = "char_entropy"
    override def nullSafeEval(input: Any): Any =
      entropyBits(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"org.apache.spark.sql.graftio.TextNorm.entropyBits($c)")
    override protected def withNewChildInternal(
        newChild: Expression): CharEntropy = copy(child = newChild)
  }

  def charEntropy(c: Column): Column =
    Columns.of(CharEntropy(Columns.exprOf(c)))
}

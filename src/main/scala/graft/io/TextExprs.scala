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

  // --- CCNet char-bigram LM (bounded 38-symbol alphabet) ---------------
  //
  // The model space is fixed (lowercase letters + digits + space, every
  // other code point bucketed to '_': 38² = 1444 cells regardless of
  // corpus size), so both LM passes fuse into per-row code:
  //   pass 1  fold each doc's bigrams straight into a 1444-cell count
  //           array (a typed Aggregator — map-side combined, the partial
  //           state is ONE array per task);
  //   pass 2  score each doc against the broadcast log-prob table in one
  //           codegen'd expression.
  // The previous formulation exploded ONE ROW PER CHARACTER-BIGRAM of
  // the corpus and pushed that frame through a count shuffle plus a
  // per-doc mean shuffle — the shape [[CharEntropy]]'s scaladoc already
  // names as the 100 TB killer (~6 orders of magnitude more shuffled
  // rows). Measured at factor 100 the explode form walled at 126 s;
  // the fused form shuffles nothing but the 1444-cell partials.

  /** 38-symbol alphabet index of a (lowercased) code point; mirrors the
    * oracle's `regexp_replace(lower(text), '[^a-z0-9 ]', '_', 'g')`:
    * one code point → one symbol, astral included. */
  private def symIdx(cp: Int): Int =
    if (cp >= 'a' && cp <= 'z') cp - 'a'
    else if (cp >= '0' && cp <= '9') 26 + cp - '0'
    else if (cp == ' ') 36
    else 37

  /** Fold one document's bigram counts into `buf` (length 38²) in place.
    * Lowercasing goes through [[UTF8String.toLowerCase]] — the exact
    * function behind Spark's `lower()` — so counts match the previous
    * `lower`+`regexp_replace`+explode formulation bit for bit. */
  def bigramCountsInto(s: UTF8String, buf: Array[Long]): Unit = {
    val str = s.toLowerCase.toString
    var i = 0
    var prev = -1
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val cur = symIdx(cp)
      if (prev >= 0) buf(prev * 38 + cur) += 1L
      prev = cur
    }
  }

  /** Mean ln P(b|a) of the doc's bigrams against the precomputed
    * log-prob table (`lp(a*38+b)`); null when the doc has no bigram.
    * Summation walks the doc's bigrams in document order — the same
    * order (and the same double values) the explode+`avg` formulation
    * accumulated, so rounded outputs are unchanged. */
  def bigramScore(s: UTF8String, lp: Array[Double]): java.lang.Double = {
    val str = s.toLowerCase.toString
    var i = 0
    var prev = -1
    var sum = 0.0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val cur = symIdx(cp)
      if (prev >= 0) { sum += lp(prev * 38 + cur); n += 1L }
      prev = cur
    }
    if (n == 0L) null else java.lang.Double.valueOf(sum / n)
  }

  final case class CharBigramScore(child: Expression, lp: Array[Double])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "char_bigram_score"
    override def nullSafeEval(input: Any): Any =
      bigramScore(input.asInstanceOf[UTF8String], lp)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lpRef = ctx.addReferenceObj("lp", lp, "double[]")
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("bgScore")
        s"""
           |java.lang.Double $tmp =
           |  org.apache.spark.sql.graftio.TextNorm.bigramScore($c, $lpRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(
        newChild: Expression): CharBigramScore = copy(child = newChild)
  }

  def charBigramScore(c: Column, lp: Array[Double]): Column =
    Columns.of(CharBigramScore(Columns.exprOf(c), lp))

  /** Corpus bigram-count model: one distributed fold to a single
    * 1444-cell array (a few KB — model-scale by construction). */
  final class BigramCountAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](38 * 38)
    override def reduce(buf: Array[Long], text: String): Array[Long] = {
      if (text != null) bigramCountsInto(UTF8String.fromString(text), buf)
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}

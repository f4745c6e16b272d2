package org.apache.spark.sql.graftio

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector arithmetic over embedding columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) is evaluated INTERPRETED by Catalyst — per row it allocates
  * a zipped intermediate array and walks it through lambda closures. At
  * near-dup scale (millions of candidate pairs x 64-dim vectors) that
  * interpretation overhead dominates the whole query. These expressions
  * compile to a tight fused loop (`doGenCode`): no intermediate array, one
  * pass accumulating dot/norms, whole-stage-codegen friendly.
  *
  * Both `array<float>` (the stored embedding type) and `array<double>`
  * (literal query vectors / pre-normalized copies) element types are
  * accepted per side, read directly via `ArrayData.getFloat/getDouble` —
  * no up-cast copy of the float side.
  *
  * Semantics mirror the HOF formulation they replace: NULL result on a
  * NULL input, a length mismatch (zip_with pads with null and the sum
  * collapses to null), or a null element; accumulation is in index order
  * so double rounding is identical.
  */
object VecMath {

  private val AcceptedArray =
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType))

  sealed abstract class VecBinary extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(AcceptedArray, AcceptedArray)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    @transient protected lazy val leftFloat: Boolean =
      left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient protected lazy val rightFloat: Boolean =
      right.dataType.asInstanceOf[ArrayType].elementType == FloatType

    protected def getL(a: ArrayData, i: Int): Double =
      if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
    protected def getR(a: ArrayData, i: Int): Double =
      if (rightFloat) a.getFloat(i).toDouble else a.getDouble(i)

    protected def genGetL(arr: String, i: String): String =
      if (leftFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    protected def genGetR(arr: String, i: String): String =
      if (rightFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

    /** Expression computing the result from accumulated dot / |a|^2 /
      * |b|^2 (java source fragment; variables are in scope). */
    protected def genResult(dot: String, na: String, nb: String): String
    protected def result(dot: Double, na: Double, nb: Double): Double

    protected def nullSafeVecEval(leftV: Any, rightV: Any): Any = {
      val a = leftV.asInstanceOf[ArrayData]
      val b = rightV.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = getL(a, i); val y = getR(b, i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      result(dot, na, nb)
    }
    override def nullSafeEval(leftV: Any, rightV: Any): Any =
      nullSafeVecEval(leftV, rightV)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    final double $x = ${genGetL(a, i)};
           |    final double $y = ${genGetR(b, i)};
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = ${genResult(dot, na, nb)}; }
           |}
         """.stripMargin
      })
  }

  /** `sum_i a_i * b_i` as one fused codegen loop. */
  final case class ArrayDotProduct(left: Expression, right: Expression)
      extends VecBinary {
    override def prettyName: String = "vec_dot"
    override protected def genResult(dot: String, na: String, nb: String) = dot
    override protected def result(dot: Double, na: Double, nb: Double) = dot
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArrayDotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity `dot / (|a| |b|)` in ONE pass over both arrays
    * (neither side needs pre-normalization). Zero-norm input follows IEEE
    * double division (NaN), like the Column-arithmetic formulation. */
  final case class ArrayCosine(left: Expression, right: Expression)
      extends VecBinary {
    override def prettyName: String = "vec_cosine"
    override protected def genResult(dot: String, na: String, nb: String) =
      s"$dot / (Math.sqrt($na) * Math.sqrt($nb))"
    override protected def result(dot: Double, na: Double, nb: Double) =
      dot / (math.sqrt(na) * math.sqrt(nb))
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ArrayCosine =
      copy(left = newLeft, right = newRight)
  }

  def dot(a: Column, b: Column): Column =
    Columns.of(ArrayDotProduct(Columns.exprOf(a), Columns.exprOf(b)))

  def cosine(a: Column, b: Column): Column =
    Columns.of(ArrayCosine(Columns.exprOf(a), Columns.exprOf(b)))
}

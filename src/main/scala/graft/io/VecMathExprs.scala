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

  /** splitmix64 finalizer over `h + GOLDEN*(i+1)` — the per-permutation
    * hash family for [[MinHashMins]]. Kept as one shared definition so
    * the interpreted and codegen paths cannot diverge. */
  def minhashMix(h: Long, i: Int): Long = {
    var z = h + 0x9e3779b97f4a7c15L * (i + 1).toLong
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature in ONE fused pass: for each of `numHashes`
    * splitmix64-derived permutations, the minimum over the input 64-bit
    * shingle hashes. The higher-order formulation
    * (`transform(0..n, i => array_min(transform(hs, h => xxhash64(h, i))))`)
    * evaluates interpreted and allocates `numHashes` intermediate arrays
    * per document; this loops elements x permutations in generated code
    * with a single primitive output array. An empty input yields
    * Long.MaxValue sentinels (all empty docs still collide in every band,
    * like the null signature of the HOF version; exact verification
    * filters them either way). */
  final case class MinHashMins(child: Expression, numHashes: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    require(numHashes > 0)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_mins"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h = arr.getLong(j)
          var i = 0
          while (i < numHashes) {
            val z = VecMath.minhashMix(h, i)
            if (z < mins(i)) mins(i) = z
            i += 1
          }
        }
        j += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(mins)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val mins = ctx.freshName("mins")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val z = ctx.freshName("z")
        val n = ctx.freshName("n")
        s"""
           |final long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |final int $n = $arr.numElements();
           |for (int $j = 0; $j < $n; $j++) {
           |  if ($arr.isNullAt($j)) continue;
           |  final long $h = $arr.getLong($j);
           |  for (int $i = 0; $i < $numHashes; $i++) {
           |    long $z = $h + 0x9e3779b97f4a7c15L * (long) ($i + 1);
           |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
           |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
           |    $z = $z ^ ($z >>> 31);
           |    if ($z < $mins[$i]) $mins[$i] = $z;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($mins);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashMins =
      copy(child = newChild)
  }

  def minhashMins(baseHashes: Column, numHashes: Int): Column =
    Columns.of(MinHashMins(Columns.exprOf(baseHashes), numHashes))

  /** 64-bit SimHash majority vote in ONE fused pass: bit b of the result
    * is set when more than half of the input hashes have bit b set.
    * Replicates the per-bit Column-aggregate formulation exactly,
    * including its null semantics (any null element nulls every vote,
    * collapsing the sketch to 0). */
  final case class SimHashVote(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_vote"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var j = 0
      while (j < n) {
        if (arr.isNullAt(j)) return 0L
        val h = arr.getLong(j)
        var b = 0
        while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
        j += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) { if (2L * counts(b) > n) sig |= 1L << b; b += 1 }
      sig
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val counts = ctx.freshName("counts")
        val j = ctx.freshName("j")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val n = ctx.freshName("n")
        val sig = ctx.freshName("sig")
        val anyNull = ctx.freshName("anyNull")
        s"""
           |final int $n = $arr.numElements();
           |final int[] $counts = new int[64];
           |boolean $anyNull = false;
           |for (int $j = 0; $j < $n && !$anyNull; $j++) {
           |  if ($arr.isNullAt($j)) { $anyNull = true; break; }
           |  final long $h = $arr.getLong($j);
           |  for (int $b = 0; $b < 64; $b++) {
           |    $counts[$b] += (int) (($h >>> $b) & 1L);
           |  }
           |}
           |long $sig = 0L;
           |if (!$anyNull) {
           |  for (int $b = 0; $b < 64; $b++) {
           |    if (2L * $counts[$b] > $n) $sig |= 1L << $b;
           |  }
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SimHashVote =
      copy(child = newChild)
  }

  def simhashVote(hashes: Column): Column =
    Columns.of(SimHashVote(Columns.exprOf(hashes)))

  /** Spark `round(x, 6)` for doubles, verbatim (HALF_UP via the decimal
    * string representation; NaN/Infinity pass through) — shared by the
    * interpreted and codegen paths of [[CentroidTopCells]] so the
    * centroid scores can never drift from the Column-level `round` the
    * SQL oracles replay. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Top-`probes` centroid cells of a vector in ONE fused pass — the
    * k-means/IVF assignment and probe-list kernel.
    *
    * The Column formulation (`greatest`/`array_sort` over k
    * `struct(round(cosine(vec, lit-array)), cid)` subtrees) re-reads the
    * vector k times and stops scaling in k: at k=160 cells its generated
    * code degrades to allocation-heavy evaluation and a 100x-volume
    * k-means step ran for half an hour. This expression reads the vector
    * once, loops centroids in primitive arrays (k·dim multiplies total),
    * and keeps an insertion buffer of `probes` entries.
    *
    * Semantics are bit-identical to the Column form it replaces:
    * per-cell score = `round(cosine(vec, c), 6)` ([[round6]] = Spark's
    * HALF_UP round; cosine NaN on a zero norm), order = score
    * descending with ties to the LARGER cid (the `greatest`-struct /
    * `reverse(array_sort)` convention, NaN sorting above every real
    * score like Spark's double ordering). Element 0 is therefore the
    * `centroidIdRounded` assignment. NULL on a null input, a null
    * element, or a dimension mismatch. `rounded = false` skips the
    * per-score round — the raw-cosine `centroidId` convention (IVF list
    * assignment); accumulation order matches the Column form, so raw
    * scores are bit-identical too. */
  final case class CentroidTopCells(child: Expression,
                                    centroids: Seq[Seq[Double]], probes: Int,
                                    rounded: Boolean = true)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    require(centroids.nonEmpty, "no centroids")
    require(centroids.forall(_.size == centroids.head.size),
      "ragged centroid matrix")
    require(probes >= 1 && probes <= centroids.size,
      s"probes must be in [1, ${centroids.size}]")

    override def inputTypes: Seq[AbstractDataType] = Seq(AcceptedArray)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    // returns null for NON-null inputs too (dimension mismatch, null
    // element), so nullability must not follow the child: with a
    // non-nullable child, nullSafeCodeGen binds ev.isNull to the literal
    // `false` and the fragment's `isNull = true` branch is uncompilable
    override def nullable: Boolean = true
    override def prettyName: String = "centroid_top_cells"

    @transient private lazy val childFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    @transient private lazy val k = centroids.size
    @transient private lazy val dim = centroids.head.size
    @transient private lazy val flat: Array[Double] =
      centroids.flatten.toArray
    @transient private lazy val cnorms: Array[Double] =
      centroids.map(c => math.sqrt(c.map(x => x * x).sum)).toArray

    /** Shared kernel: scores into (topS, topC); returns the filled ids. */
    private[graftio] def topCells(v: Array[Double]): Array[Int] = {
      var nv = 0.0
      var i = 0
      while (i < dim) { nv += v(i) * v(i); i += 1 }
      nv = math.sqrt(nv)
      val topS = Array.fill(probes)(Double.NegativeInfinity)
      val topC = Array.fill(probes)(-1)
      var filled = 0
      var c = 0
      while (c < k) {
        var dot = 0.0
        val off = c * dim
        var j = 0
        while (j < dim) { dot += v(j) * flat(off + j); j += 1 }
        val raw = dot / (nv * cnorms(c))
        val s = if (rounded) round6(raw) else raw
        var p = 0
        while (p < filled && java.lang.Double.compare(s, topS(p)) < 0) p += 1
        if (p < probes) {
          var q = math.min(filled, probes - 1)
          while (q > p) { topS(q) = topS(q - 1); topC(q) = topC(q - 1); q -= 1 }
          topS(p) = s; topC(p) = c
          if (filled < probes) filled += 1
        }
        c += 1
      }
      java.util.Arrays.copyOf(topC, filled)
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      if (arr.numElements() != dim) return null
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) return null
        v(i) = if (childFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(topCells(v))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val self = ctx.addReferenceObj("centroidTopCells", this,
          classOf[CentroidTopCells].getName)
        val v = ctx.freshName("v")
        val i = ctx.freshName("i")
        val bad = ctx.freshName("bad")
        val get =
          if (childFloat) s"(double) $arr.getFloat($i)"
          else s"$arr.getDouble($i)"
        // the k x dim loop stays in compiled scala (topCells) — one
        // virtual call per row, zero closure allocation; only the array
        // copy-in is generated here, so the method never approaches the
        // 64KB codegen limit no matter how large k grows
        s"""
           |boolean $bad = ($arr.numElements() != $dim);
           |final double[] $v = $bad ? null : new double[$dim];
           |if (!$bad) {
           |  for (int $i = 0; $i < $dim; $i++) {
           |    if ($arr.isNullAt($i)) { $bad = true; break; }
           |    $v[$i] = $get;
           |  }
           |}
           |if ($bad) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
           |    .UnsafeArrayData.fromPrimitiveArray($self.topCells($v));
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): CentroidTopCells =
      copy(child = newChild)
  }

  def centroidTopCells(vec: Column, centroids: Seq[Seq[Double]],
                       probes: Int, rounded: Boolean = true): Column =
    Columns.of(CentroidTopCells(Columns.exprOf(vec), centroids, probes,
      rounded))
}

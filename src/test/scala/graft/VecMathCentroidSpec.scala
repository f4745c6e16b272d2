package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecMath

/** `CentroidTopCells` must be bit-identical to the Column formulation it
  * replaced (greatest / reverse-array_sort over `struct(round(cosine(v,
  * lit-array)), 6), cid)` subtrees): same Spark-round HALF_UP scores,
  * same larger-cid tie-break, same NaN-sorts-largest behavior. The
  * fixture forces ties with duplicated centroids and includes a zero
  * vector (NaN scores) and float inputs (the stored embedding type). */
class VecMathCentroidSpec extends AnyFunSuite {

  private def oldTopCells(vec: org.apache.spark.sql.Column,
                          cents: Seq[Seq[Double]], probes: Int) = {
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct(round(VecMath.cosine(vec, array(c.map(lit): _*)), 6)
        .as("score"), lit(i).as("cid"))
    }: _*)
    transform(slice(reverse(array_sort(scored)), 1, probes),
      s => s.getField("cid"))
  }

  test("fused top-cells == struct-sort formulation (ties, NaN, floats)") {
    val sp = SparkSpec.spark
    import sp.implicits._
    // centroids 1 and 2 identical -> every vector ties them exactly;
    // centroid 3 is a scaled copy of 0 (cosine is scale-invariant, so 0
    // and 3 tie too); rounding to 6 makes near-ties exact on both paths
    val cents = Seq(
      Seq(1.0, 0.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0, 0.0),
      Seq(2.0, 0.0, 0.0, 0.0),
      Seq(0.5, 0.5, 0.5, 0.5))
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map { i =>
      (i.toLong, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    } :+ (999L, Seq(0f, 0f, 0f, 0f)) // zero vector: all-NaN scores
    val df = rows.toDF("id", "v").localCheckpoint()
    for (probes <- Seq(1, 2, 5)) {
      val got = df.select(col("id"),
        VecMath.centroidTopCells(col("v"), cents, probes).as("c"))
      val want = df.select(col("id"),
        oldTopCells(col("v"), cents, probes).as("c"))
      assert(got.exceptAll(want).count() == 0 &&
        want.exceptAll(got).count() == 0,
        s"fused kernel diverged from the Column form at probes=$probes")
    }
  }

  test("raw (unrounded) mode matches the unrounded greatest-struct argmax") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val cents = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0, 0.0), Seq(0.3, 0.3, 0.3, 0.1))
    def oldArgmax(vec: org.apache.spark.sql.Column) =
      greatest(cents.zipWithIndex.map { case (c, i) =>
        struct(VecMath.cosine(vec, array(c.map(lit): _*)).as("score"),
          lit(i).as("cid"))
      }: _*).getField("cid")
    val rnd = new scala.util.Random(11)
    val df = (0 until 400).map { i =>
      (i.toLong, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)
    }.toDF("id", "v").localCheckpoint()
    val got = df.select(col("id"), element_at(
      VecMath.centroidTopCells(col("v"), cents, 1, rounded = false), 1)
      .as("c"))
    val want = df.select(col("id"), oldArgmax(col("v")).as("c"))
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
  }

  test("null element and dimension mismatch return null") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null)),
      (2L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (3L, Seq[java.lang.Double](3.0, 4.0))).toDF("id", "v")
    val out = df.select(col("id"),
        VecMath.centroidTopCells(col("v"), cents, 1).as("c"))
      .orderBy(col("id")).collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && !out(2).isNullAt(1))
  }

  test("non-nullable child: nullable stays true, codegen compiles, mismatch is null") {
    // regression: the expression returns null for NON-null inputs
    // (dimension mismatch), so nullable must not follow the child — with
    // a non-nullable child, nullSafeCodeGen would bind ev.isNull to the
    // literal `false` and the generated `false = true;` fails janino
    val sp = SparkSpec.spark
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    // array(non-nullable exprs) over range() is a non-nullable column
    val df = sp.range(4).select(
      array(col("id").cast("double"), lit(1.0), lit(2.0)).as("v"))
    assert(!df.schema("v").nullable, "fixture must be non-nullable")
    val expr = VecMath.centroidTopCells(col("v"), cents, 1)
    assert(df.select(expr.as("c")).schema("c").nullable)
    // 3-dim vectors vs 2-dim centroids: every row is a mismatch -> null,
    // evaluated through the codegen path without a compile failure
    val out = df.select(expr.as("c")).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}

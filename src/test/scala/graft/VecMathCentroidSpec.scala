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

  test("hyperplaneKeys == per-table when-chain formulation (incl. " +
      "null element, wrong length, null vector, zero vector, floats)") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val tables = 5; val nPlanes = 7; val dim = 6
    val allPlanes = (0 until tables).map(t =>
      graft.llm.Embed.randomPlanes(nPlanes, dim, 42L + t))
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[java.lang.Double])] =
      (0 until 300).map { i =>
        (i.toLong, Seq.fill(dim)(java.lang.Double.valueOf(
          rnd.nextDouble() * 2 - 1)))
      } ++ Seq(
        (300L, Seq.fill(dim)(java.lang.Double.valueOf(0.0))), // zero vec
        (301L, Seq[java.lang.Double](1.0, null, 1.0, 1.0, 1.0, 1.0)),
        (302L, Seq[java.lang.Double](1.0, 2.0)),              // wrong dim
        (303L, null))                                         // null vec
    val df = rows.toDF("id", "v")
    val fused = df.select(col("id"),
        VecMath.hyperplaneKeys(col("v"), allPlanes).as("k"))
      .orderBy(col("id")).collect()
    val oldCols = allPlanes.zipWithIndex.map { case (p, t) =>
      graft.llm.Embed.hyperplaneKey(col("v"), p).as(s"k$t") }
    val old = df.select((col("id") +: oldCols): _*)
      .orderBy(col("id")).collect()
    fused.zip(old).foreach { case (f, o) =>
      val fk = f.getSeq[Long](1)
      val ok = (0 until tables).map(t => o.getLong(1 + t))
      assert(fk == ok, s"id ${f.getLong(0)}: $fk != $ok")
    }
    // float input (the stored embedding element type)
    val fdf = Seq((0L, Seq(0.5f, -0.25f, 1f, 2f, -3f, 0.125f)))
      .toDF("id", "v")
    val ff = fdf.select(VecMath.hyperplaneKeys(col("v"), allPlanes)).head()
    val fo = fdf.select(array(allPlanes.map(p =>
      graft.llm.Embed.hyperplaneKey(col("v"), p)): _*)).head()
    assert(ff.getSeq[Long](0) == fo.getSeq[Long](0))
  }
}

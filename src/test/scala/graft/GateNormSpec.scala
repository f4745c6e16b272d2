package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class GateNormSpec extends AnyFunSuite {

  test("quantize emits a __cls discriminator per float column: " +
      "null/nan/±inf/big stay distinguishable despite quantizing to NULL") {
    val sp = SparkSpec.spark
    import sp.implicits._
    val df = Seq(
      (0L, Option(1.5)), (1L, Option.empty[Double]),
      (2L, Option(Double.NaN)), (3L, Option(Double.PositiveInfinity)),
      (4L, Option(Double.NegativeInfinity)), (5L, Option(1.0e16)))
      .toDF("id", "x")
    val q = GateNorm.quantize(df)
    assert(q.columns.toSeq == Seq("id", "x", "x__cls"))
    val rows = q.collect().map(r => r.getLong(0) ->
      ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2))).toMap
    assert(rows(0L) == ((Some(1500000L), 0L)))  // finite: micro-units, cls 0
    assert(rows(1L) == ((None, 1L)))            // null
    assert(rows(2L) == ((None, 2L)))            // nan
    assert(rows(3L) == ((None, 3L)))            // +inf
    assert(rows(4L) == ((None, 4L)))            // -inf
    assert(rows(5L) == ((None, 5L)))            // beyond exact-int range
    // the defect class this closes: NaN vs NULL used to both land as
    // (NULL) and compare equal — now their cls codes differ (2 vs 1)
    assert(rows(2L)._2 != rows(1L)._2)
  }

  test("wrapOracle adds the matching __cls projection for float columns " +
      "and none for integer-only schemas") {
    val floatSchema = StructType(Seq(StructField("a", StringType),
      StructField("v", DoubleType)))
    val wrapped = GateNorm.wrapOracle("SELECT 1", floatSchema)
    assert(wrapped.contains("\"v__cls\""))
    assert(wrapped.contains("isnan"))
    val intSchema = StructType(Seq(StructField("n", LongType)))
    val w2 = GateNorm.wrapOracle("SELECT 1", intSchema)
    assert(!w2.contains("__cls"))
  }
}

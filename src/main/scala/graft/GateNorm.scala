package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine hash armor for the driver's correctness gate.
  *
  * The driver hashes EXACT cell values of the Spark parquet dump against a
  * DuckDB oracle run through pandas. Two classes of spurious mismatch
  * survived per-gate hardening for two rounds:
  *
  *   1. dtype skew — DuckDB `sum(BIGINT)` returns HUGEINT, which pandas
  *      renders as float64 (`78.0`) while the Spark parquet column is
  *      int64 (`78`). Every round-6 red gate (`mm_vad`,
  *      `ts_cardinality_report`, `doc_vocab_growth`,
  *      `embed_cluster_balance`, `ts_histogram_quantile`) was exactly
  *      this, verified cell-by-cell with scripts/strictdiff.py.
  *   2. last-ulp double skew — engine-specific `round()` implementations
  *      disagree on manufactured half-way decimals (Spark BigDecimal
  *      HALF_UP on the exact double expansion vs DuckDB scaled
  *      std::round), and accumulation-order noise flips the last bits.
  *
  * The fix is mechanical, not per-gate: EVERY gated numeric column leaves
  * BOTH engines as an int64 —
  *   - integer-typed columns are cast to BIGINT on both sides;
  *   - floating columns are quantized to micro-units with
  *     `floor(x * 1e6 + 0.5)`, an IEEE-exact op chain (multiply, add,
  *     floor are all correctly rounded and identically defined in JVM
  *     `Math.floor` and C++ `std::floor`) — unlike `round()`, identical
  *     input doubles can NOT quantize differently across engines.
  *
  * Guard rails on the quantizer (applied with the same predicates on both
  * sides, so the branch taken is identical for identical inputs):
  *   - NULL / NaN / ±Inf → NULL (DuckDB cannot cast non-finite to BIGINT);
  *   - |x| > 9e15 (beyond double's exact-integer range) → NULL;
  *   - |x| >= 4e12 → `floor(x + 0.5)` unscaled (scaling would overflow
  *     int64); such magnitudes have no sub-unit precision anyway.
  *
  * [[Verify]] applies [[quantize]] to each query result and rewrites the
  * paired oracle SQL with [[wrapOracle]] (a `SELECT * REPLACE` projection,
  * which DuckDB streams order-preservingly over the inner query), so the
  * pair stays in lockstep no matter what a gate author emits.
  */
object GateNorm {

  /** Quantize one floating column to micro-unit int64 (see object doc). */
  def quantizeCol(c: Column): Column = {
    val d = c.cast(DoubleType)
    val bad = isnan(d) || d === lit(Double.PositiveInfinity) ||
      d === lit(Double.NegativeInfinity) || abs(d) > lit(9.0e15)
    when(d.isNull || bad, lit(null).cast(LongType))
      .otherwise(when(abs(d) >= lit(4.0e12), floor(d + lit(0.5)))
        .otherwise(floor(d * lit(1000000.0) + lit(0.5))))
  }

  /** Value-class discriminator for a floating column: the quantizer folds
    * NULL, NaN, ±Inf and |x|>9e15 all to NULL, which would make the gate
    * blind to a GENUINE non-finite divergence (Spark NaN where the oracle
    * has NULL, +Inf vs a huge finite value). Both sides emit this small
    * int beside the quantized value so that class still has to match:
    * 0=finite, 1=null, 2=nan, 3=+inf, 4=-inf, 5=finite beyond double's
    * exact-int range. */
  def classCol(c: Column): Column = {
    val d = c.cast(DoubleType)
    when(d.isNull, lit(1)).when(isnan(d), lit(2))
      .when(d === lit(Double.PositiveInfinity), lit(3))
      .when(d === lit(Double.NegativeInfinity), lit(4))
      .when(abs(d) > lit(9.0e15), lit(5))
      .otherwise(lit(0)).cast(LongType)
  }

  /** All integer columns → int64; all floating columns → micro-unit
    * int64 PLUS a `<name>__cls` value-class column (see [[classCol]]).
    * Non-numeric columns (string/bool/binary) pass through. */
  def quantize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case DoubleType | FloatType => quantizeCol(col(f.name)).as(f.name)
        case ByteType | ShortType | IntegerType | LongType =>
          col(f.name).cast(LongType).as(f.name)
        case _ => col(f.name)
      }
    }
    val cls = df.schema.fields.toIndexedSeq.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType =>
        classCol(col(f.name)).as(s"${f.name}__cls")
    }
    df.select(cols ++ cls: _*)
  }

  private def qid(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** DuckDB twin of [[quantizeCol]] — same predicates, same op chain. */
  def oracleQuantExpr(name: String): String = {
    val c = s"CAST(${qid(name)} AS DOUBLE)"
    s"CASE WHEN ${qid(name)} IS NULL THEN NULL" +
      s" WHEN isnan($c) OR NOT isfinite($c) OR abs($c) > 9.0e15 THEN NULL" +
      s" WHEN abs($c) >= 4.0e12 THEN CAST(floor($c + 0.5) AS BIGINT)" +
      s" ELSE CAST(floor($c * 1000000.0 + 0.5) AS BIGINT) END AS ${qid(name)}"
  }

  /** DuckDB twin of [[classCol]] — same predicates, same order. */
  def oracleClassExpr(name: String): String = {
    val c = s"CAST(${qid(name)} AS DOUBLE)"
    s"CASE WHEN ${qid(name)} IS NULL THEN 1 WHEN isnan($c) THEN 2" +
      s" WHEN isinf($c) AND $c > 0 THEN 3 WHEN isinf($c) THEN 4" +
      s" WHEN abs($c) > 9.0e15 THEN 5 ELSE 0 END" +
      s" AS ${qid(name + "__cls")}"
  }

  /** Rewrite an oracle query so its numeric columns match the
    * [[quantize]]d Spark output: driven by the SPARK result schema (the
    * two sides' column sets are identical — the driver checks that
    * independently). Emits a plain projection over the original query
    * (quantized replacements + the `__cls` discriminators); DuckDB
    * preserves the inner ORDER BY through it. */
  def wrapOracle(sql: String, schema: StructType): String = {
    val reps = schema.fields.toIndexedSeq.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType => Some(oracleQuantExpr(f.name))
        case ByteType | ShortType | IntegerType | LongType =>
          Some(s"CAST(${qid(f.name)} AS BIGINT) AS ${qid(f.name)}")
        case _ => None
      }
    }
    val cls = schema.fields.toIndexedSeq.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType =>
        oracleClassExpr(f.name)
    }
    if (reps.isEmpty) sql
    else s"SELECT * REPLACE (${reps.mkString(", ")})" +
      (if (cls.isEmpty) "" else s", ${cls.mkString(", ")}") +
      s" FROM (\n$sql\n) __graft_gate"
  }
}

package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics the reference explicitly lacks (SURVEY §2.8 scope deltas:
  * "no distinct-count/HLL, no grouping sets/cube/rollup, no ranking
  * window functions"), added as first-class Spark-native operators over
  * the same sample frame. Each is deliberately a thin declarative plan —
  * Catalyst already has the right physical machinery (partial hash
  * aggregation, expand-based rollup, window exec); the value here is the
  * deterministic, oracle-replayable formulation and the scale shape.
  */
object TsAnalytics {

  /** 2^60 as a double — the md5-60-bit hash universe
    * ([[graft.llm.Sample.hashFrac]] family). */
  private val Hash60Universe = 1152921504606846976.0

  /** Deterministic theta-sketch distinct count: keep only items whose
    * md5-60-bit hash fraction is below `theta`, count them distinct per
    * group, estimate `count / theta` (Theta/KMV sketch family with a
    * FIXED threshold — ICDT'05 distinct-elements line; the reference has
    * no distinct-count at all).
    *
    * Scale shape: the hash filter drops `(1-theta)` of all rows BEFORE
    * any shuffle — at 100 TB with theta=2^-14 the distinct aggregation
    * shuffles ~n/16k rows — and the surviving distinct is a plain hash
    * aggregate (map-side partial). Unlike approx_count_distinct's HLL
    * the estimate is exactly reproducible anywhere md5 exists (the
    * DuckDB oracle replays it bit-for-bit), trading a constant-factor
    * larger shuffle for determinism.
    *
    * Output: group cols, `n_kept` (rows surviving the filter, distinct),
    * `distinct_est` (double).
    */
  def thetaDistinct(df: DataFrame, groupCols: Seq[String], item: Column,
                    theta: Double, seed: String = ""): DataFrame = {
    require(theta > 0.0 && theta <= 1.0, "theta must be in (0, 1]")
    val frac = conv(substring(md5(concat(item.cast("string"), lit(seed))),
      1, 15), 16, 10).cast("long").cast("double") / lit(Hash60Universe)
    df.select((groupCols.map(col) :+ item.cast("string").as("__item") :+
        frac.as("__frac")): _*)
      .filter(col("__frac") < lit(theta))
      .groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col("__item")).as("n_kept"))
      .withColumn("distinct_est", col("n_kept") / lit(theta))
  }

  /** Rollup / cube aggregation over dimension columns (SURVEY §2.8: the
    * reference has no grouping sets). `dims` are (name, expr) pairs;
    * output carries every dim (null at the rolled-up levels), a `gid`
    * bitmask (`grouping_id()`, first dim = most significant bit — the
    * SQL-standard GROUPING() layout DuckDB/Postgres share), plus
    * count/sum/avg of `value`.
    *
    * One expand + one hash aggregate: Catalyst's Expand emits one copy
    * of each row per grouping set, and the aggregate is still map-side
    * partial — no per-level rescans of the fact table.
    */
  def rollupAgg(df: DataFrame, dims: Seq[(String, Column)], value: Column,
                cube: Boolean = false): DataFrame = {
    require(dims.nonEmpty, "rollupAgg requires at least one dimension")
    val in = df.select(
      (dims.map { case (n, c) => c.as(n) } :+ value.as("__v")): _*)
    val dimCols = dims.map { case (n, _) => col(n) }
    val grouped =
      if (cube) in.cube(dimCols: _*) else in.rollup(dimCols: _*)
    grouped.agg(
      grouping_id().as("gid"),
      count(col("__v")).as("n"),
      sum(col("__v")).as("value_sum"),
      avg(col("__v")).as("value_avg"))
  }

  /** Ranked top-k per group (SURVEY §2.8: no ranking windows in the
    * reference): aggregate `value` per (group, series), then keep each
    * group's top `k` by the aggregate with an explicit deterministic
    * tie-break on the series name, emitting `rnk`.
    *
    * Two shuffles total, both post-reduction: the per-series aggregate
    * is map-side partial over the fact table, and the window runs over
    * the (small) per-series frame — never over raw samples. The filter
    * on row_number is the TopK-per-group pattern Catalyst turns into a
    * running WindowExec with an early filter (rank pushdown in 3.5+).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, seriesCol: String,
                   value: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val agged = df.groupBy(col(groupCol), col(seriesCol))
      .agg(sum(value).as("value_sum"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("value_sum").desc, col(seriesCol).asc)
    agged
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}

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

  /** Exact per-(group, time-bucket) quantiles — "p50/p95/p99 per metric
    * per day", the rollup the reference can only approximate with
    * min/max (SURVEY §2.6 has no percentile aggregate). Buckets are
    * `ts div bucketNs` (integer division on ns longs — floats lose
    * integer precision past 2^53). Exact `percentile` (quantile_cont
    * interpolation) so the report replays externally; the
    * value-buffer-per-group caveat of
    * [[graft.llm.Text.lengthQuantiles]] applies.
    *
    * Output: group cols, `bucket` (ns of bucket start), `n`, one
    * `p<NN>` per prob (rounded 6). */
  def bucketQuantiles(df: DataFrame, groupCols: Seq[String], tsCol: String,
                      valueCol: String, bucketNs: Long,
                      probs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(bucketNs > 0 && probs.nonEmpty)
    val bucket = (expr(s"$tsCol div ${bucketNs}L") * lit(bucketNs)).as("bucket")
    val agged = df
      .groupBy((groupCols.map(col) :+ bucket): _*)
      .agg(percentile(col(valueCol),
        array(probs.map(p => lit(p)): _*)).as("__q"),
        count(col(valueCol)).as("n"))
    val qCols = probs.zipWithIndex.map { case (p, i) =>
      round(col("__q").getItem(i), 6).as("p" + math.round(p * 100).toInt)
    }
    agged.select((groupCols.map(col) ++ Seq(col("bucket"), col("n")) ++
      qCols): _*)
  }

  /** Linear-interpolation resampling onto a regular grid — the gap-fill
    * the reference explicitly lacks (its only regularization is bucketed
    * aggregation; README's "no interpolation" is a long-standing user
    * ask). For every series (the `on` key) and every grid instant
    * `from + i*stepNs < to`, emits the linear interpolation between the
    * nearest samples on each side; a grid point outside a series'
    * observed span is null (strict interpolation, no extrapolation),
    * and a grid point landing exactly on a sample returns that sample.
    *
    * Shape: the grid is generated per series (series-dimension rows x
    * points — never a driver loop), unioned with the samples, and BOTH
    * neighbor carries run in the SAME window partition (one shuffle on
    * the series key; the backward carry reuses the forward sort in
    * reverse). A naive per-grid-point range join would be O(samples x
    * points) per series.
    *
    * Output: on cols, `ts` (grid instant), `value` (interpolated,
    * rounded 6, null in gaps beyond the span). */
  def resampleLinear(df: DataFrame, on: Seq[String], tsCol: String,
                     valueCol: String, stepNs: Long, fromNs: Long,
                     toNs: Long): DataFrame = {
    require(on.nonEmpty && stepNs > 0 && toNs > fromNs)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRev = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // collapse duplicate-instant samples to max (the asOf convention):
    // two samples at one (key, ts) would otherwise make the carried
    // neighbor order- and partition-dependent
    val samples = df.select(
      (on.map(col) :+ col(tsCol).cast("long").as("__t") :+
        col(valueCol).cast("double").as("__v")): _*)
      .groupBy((on.map(col) :+ col("__t")): _*)
      .agg(max(col("__v")).as("__v"))
      .withColumn("__side", lit(0))
    val grid = df.select(on.map(col): _*).distinct()
      .withColumn("__t", explode(expr(
        s"sequence(${fromNs}L, ${toNs - 1}L, ${stepNs}L)")))
      .withColumn("__v", lit(null).cast("double"))
      .withColumn("__side", lit(1))
    // sample sorts BEFORE the grid row at the same instant, so an exact
    // hit is its own "previous" neighbor and interpolates to itself
    val carried = samples.unionByName(grid)
      .withColumn("__prev", last(
        when(col("__side") === 0, struct(col("__t").as("t"), col("__v").as("v"))),
        ignoreNulls = true).over(w))
      .withColumn("__next", last(
        when(col("__side") === 0, struct(col("__t").as("t"), col("__v").as("v"))),
        ignoreNulls = true).over(wRev))
    val pt = col("__prev.t"); val pv = col("__prev.v")
    val nt = col("__next.t"); val nv = col("__next.v")
    val value =
      when(pt === col("__t"), pv) // exact hit (incl. prev==next case)
        .when(pt.isNotNull && nt.isNotNull,
          pv + (nv - pv) * (col("__t") - pt).cast("double") /
            (nt - pt).cast("double"))
        .otherwise(lit(null).cast("double"))
    carried
      .filter(col("__side") === 1)
      .select((on.map(col) :+ col("__t").as("ts") :+
        round(value, 6).as("value")): _*)
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

package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plan.{Frame, TsStore}

/** Forecast-based anomaly detector — a WORKING revival of the reference's
  * legacy node (reference: query_processing/anomaly.cpp:1-208 config
  * surface; detection rule anomalydetector.cpp:557-598: per time-frame,
  * error_s = |x_s - forecast_s|, a series is anomalous when
  * error_s > sqrt(sum_s error_s^2) * threshold). The reference node is
  * dead code (put() returns false); semantics here follow its detector
  * classes.
  *
  * `approx:true` runs the reference's REAL CountMin pipeline
  * (anomalydetector.cpp CountingSketch, :18-168 + the sketch detector
  * :545-600): per frame an N x K sketch of summed values, the forecaster
  * applied CELL-wise across frames, error sketch = |forecast - actual|,
  * anomaly when the median-of-rows unbiased estimate exceeds
  * sqrt(estimateF2) * threshold. Sketch state is N*2^bits cells per
  * frame regardless of series cardinality — that is the scale contract
  * the sketch exists for, and it holds here as the shuffle width.
  * Note the sketch RULE differs from the exact rule even collision-free
  * (the reference's F2 estimator subtracts sum^2/(K-1)); both are
  * faithfully implemented, both oracle-gated.
  *
  * Forecasters (anomalydetector.cpp sliding windows):
  *  - sma:                  mean of the last `period` values (NaN until full)
  *  - ewma / exp-smoothing: s' = alpha*x + (1-alpha)*s   (seeded with x)
  *  - double-exp-smoothing: level+trend (alpha, gamma)
  *  - holt-winters:         additive seasonal (alpha, beta, gamma, period)
  * All forecasts are the value predicted BEFORE observing the sample.
  */
object Anomaly {

  private def fail(msg: String): Nothing = throw Pipe.PipeException(msg)

  def node(frame: Frame, params: Map[String, Any]): Frame = {
    // numeric-param coercion is Pipe's, so the rules can never drift
    // between the anomaly node and the other pipeline nodes
    def dbl(k: String): Option[Double] = params.get(k).map(Pipe.anyToDouble)
    def req(k: String): Double =
      dbl(k).getOrElse(fail(s"Parameter $k should be set"))
    val method = params.get("method") match {
      case Some(s: String) => s
      case _               => fail("Parameter method should be set")
    }
    val threshold = req("threshold")
    def coef(k: String): Double = {
      val v = req(k)
      if (v < 0.0 || v > 1.0) fail(s"`$k` should be in [0, 1] range")
      v
    }
    val mk: () => ColState = method match {
      case "sma" | "simple-moving-average" =>
        val period = req("period").toInt
        if (period <= 0) fail("`period` should be positive")
        () => new SmaForecast(period)
      case "ewma" | "exp-smoothing" =>
        val alpha = coef("alpha")
        () => new EwmaForecast(alpha)
      case "double-exp-smoothing" =>
        val alpha = coef("alpha"); val gamma = coef("gamma")
        () => new DoubleExpForecast(alpha, gamma)
      case "holt-winters" =>
        val alpha = coef("alpha"); val beta = coef("beta")
        val gamma = coef("gamma"); val period = req("period").toInt
        if (period <= 0) fail("`period` should be positive")
        () => new HoltWintersForecast(alpha, beta, gamma, period)
      case other => fail("Unknown forecasting method")
    }

    import TsStore.{Sname, Ts}
    // Scalar stream required; like the reference (GROUP_BY_REQUIRED,
    // anomaly.cpp SAXNode-style requirement), the rule only makes sense on
    // time-bucketed data — one frame per bucket across series. A
    // group-aggregate frame with one func qualifies (its single value
    // column is the scalar).
    if (frame.valueCols.size != 1) fail("anomaly requires a scalar stream")

    val approx = params.get("approx") match {
      case Some(b: Boolean) => b
      case Some(s: String)  => s == "true"
      case None             => false
      case other            => fail(s"bad approx: $other")
    }
    if (approx) {
      // reference ctor defaults (anomaly.cpp:101-102) + validate_sketch_params
      val bits = dbl("bits").map(_.toInt).getOrElse(10)
      val nHashes = dbl("hashes").map(_.toInt).getOrElse(3)
      if (bits < 8 || bits > 16)
        fail("Anomaly detector parameter `bits` out of range")
      if (nHashes % 2 == 0)
        fail("Anomaly detector parameter `hashes` should be odd")
      if (nHashes < 1 || nHashes > 9)
        fail("Anomaly detector parameter `hashes` out of range")
      return sketchNode(frame, mk, threshold, bits, nHashes)
    }

    val Value = frame.valueCols.head
    // 1. per-series sequential forecast (partition-local state)
    val withF = Pipe.statefulColumn(frame, Value, "__forecast", mk)
    // 2. per-time-frame detection rule
    val err = abs(col(Value) - col("__forecast"))
    // The per-Ts window partition is
    // the operator's semantic unit (the reference's cross-section error
    // norm over all series at one instant), bounded by the SERIES count,
    // not the corpus: time growth adds partitions, series growth widens
    // them (7.4M series per instant at the 1000x certificate — an
    // unsorted sum, not a rank, so the cost is one pass over the
    // cross-section). Exempt from the r14 low-cardinality-window
    // restructures: the key's cardinality grows with the time range.
    val f2 = sqrt(sum(when(isnan(err), 0.0).otherwise(err * err))
      .over(Window.partitionBy(col(Ts))))
    val df = withF
      .withColumn("__err", err)
      .withColumn("__f2", f2)
      .filter(!isnan(col("__err")) && col("__err") > col("__f2") * lit(threshold))
      .select(col(Sname), col(Ts), col(Value))
    frame.copy(df = df, valueCols = Seq(Value))
  }

  /** The CountMin variant (anomalydetector.cpp CountingSketch + the
    * sketch detector pipeline). Hash family is md5-based (a DuckDB twin
    * exists, like the SimHash gate) — the reference's table-driven
    * HashFnFamily is an implementation detail, not a published contract.
    *
    * Per frame ts: cell(i, h) = sum of values whose hash_i(sname) == h
    * (CountingSketch::add); each of the N*K cell streams runs the SAME
    * forecaster the exact path uses (the reference forecasts whole
    * sketches cell-wise: SMASlidingWindow<CountingSketch> etc.); the
    * error sketch is |actual - forecast| (::diff); a series is anomalous
    * when its median-of-rows unbiased estimate (::estimate) exceeds
    * sqrt(median-of-rows F2 estimate) * threshold (::estimateF2,
    * is_anomaly_candidate). */
  private def sketchNode(frame: Frame, mk: () => ColState, threshold: Double,
                         bits: Int, nHashes: Int): Frame = {
    import TsStore.{Sname, Ts}
    val Value = frame.valueCols.head
    val k = 1 << bits
    val f = 1.0 / (k - 1)
    // 60-bit md5 hash mod K (conv stays ANSI-safe at 15 hex digits)
    def hashCol(i: Int) =
      pmod(conv(substring(md5(concat(col(Sname), lit(s"#$i"))), 1, 15),
        16, 10).cast("long"), lit(k.toLong)).cast("int")
    val hashes = array((0 until nHashes).map(hashCol): _*)
    // NaN samples are excluded like the exact path excludes NaN errors
    // (when(isnan(err), 0.0)): one NaN would otherwise poison its cell in
    // EVERY sketch row, turn all F2 estimates NaN, and silently disable
    // detection for the whole frame. The dropped row also can't be
    // flagged itself — same outcome as the exact path's !isnan filter.
    // LAZY lineage cut: this frame feeds the sketch build, the frame-ts
    // grid AND the final per-series estimate join (3 consumers), and it
    // sits on top of the whole group-aggregate query subtree — uncut,
    // each consumer re-analyzes and re-executes that subtree (the r12
    // plan audit's fleet-max 22 exchanges came from exactly this). One
    // row per (series, bucket) — the op's already-aggregated input, the
    // per-doc-frame regime where the measured A/B discipline says
    // storing wins (vs the exploded per-token regime where it loses).
    // Measured (r13, factor-10 corpus, 3 passes): cuts 8.7/9.4/10.3 s
    // vs uncut 12.0/12.5/12.5 s; plan 22 exchanges/7 broadcasts -> 4/1.
    val df = frame.df.filter(!isnan(col(Value))).localCheckpoint(false)

    // 1. the actual sketch: nonzero cells per frame...
    val sparse = df
      .select(col(Ts), col(Value).as("__v"), posexplode(hashes))
      .groupBy(col(Ts), col("pos").as("i"), col("col").as("h"))
      .agg(sum(col("__v")).as("__cv"))
    // ...densified to all N*K cells (a cell silent in a frame holds 0 and
    // MUST still feed its forecaster, like the reference's table arrays)
    val cells = df.sparkSession.range(nHashes.toLong * k)
      .select((col("id") / k).cast("int").as("i"),
        pmod(col("id"), lit(k.toLong)).cast("int").as("h"))
    val dense = df.select(col(Ts)).distinct()
      .crossJoin(cells)
      .join(sparse, Seq(Ts, "i", "h"), "left")
      .na.fill(0.0, Seq("__cv"))

    // 2. per-cell forecast across frames (cell id doubles as the series
    // key for the stateful scan machinery)
    val cellFrame = frame.copy(df = dense.select(
        concat_ws(":", col("i"), col("h")).as(Sname),
        col(Ts), col("i"), col("h"), col("__cv")),
      valueCols = Seq("__cv"))
    // LAZY cut on the forecast cells too: N*2^bits cells per frame —
    // bounded by the sketch dimensions, NOT series cardinality (the
    // sketch's own scale contract) — consumed by both the frame stats
    // and the per-series estimate join, and recomputing it replays the
    // stateful per-cell scan (repartition + sort) per consumer.
    val errCells = Pipe.statefulColumn(cellFrame, "__cv", "__fc", mk)
      .withColumn("__err", abs(col("__cv") - col("__fc")))
      .localCheckpoint(false)

    // 3. frame statistics: sum_ = row-0 error sum (::_update_sum), per-row
    // F2 estimate, median across rows (N is odd). rowStats is N rows per
    // frame and feeds two consumers — cut it so the sumErr leg doesn't
    // re-aggregate the cell sketch.
    val rowStats = errCells.groupBy(col(Ts), col("i"))
      .agg(sum(col("__err") * col("__err")).as("__rowsum"),
        sum(col("__err")).as("__rowerr"))
      .localCheckpoint(false)
    val sumErr = rowStats.filter(col("i") === 0)
      .select(col(Ts), col("__rowerr").as("__sumerr"))
    val frameStats = rowStats.join(sumErr, Seq(Ts))
      .withColumn("__res",
        lit(k) * lit(f) * sqrt(col("__rowsum")) -
          lit(f) * col("__sumerr") * col("__sumerr"))
      .groupBy(col(Ts))
      .agg(element_at(array_sort(collect_list(col("__res"))),
          nHashes / 2 + 1).as("__f2"),
        first(col("__sumerr")).as("__sumerr"))
      .withColumn("__gate", sqrt(col("__f2")) * lit(threshold))

    // 4. per-series estimate: median over rows of the unbiased cell
    // estimate, compared against the frame gate
    val out = df
      .select(col(Sname), col(Ts), col(Value), posexplode(hashes))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "h")
      .join(errCells.select(col(Ts), col("i"), col("h"), col("__err")),
        Seq(Ts, "i", "h"))
      .join(frameStats, Seq(Ts))
      .withColumn("__est",
        (col("__err") - col("__sumerr") / k) / (1.0 - 1.0 / k))
      .groupBy(col(Sname), col(Ts), col(Value), col("__gate"))
      .agg(element_at(array_sort(collect_list(col("__est"))),
        nHashes / 2 + 1).as("__med"))
      .filter(!isnan(col("__med")) && !isnan(col("__gate")) &&
        col("__med") > col("__gate"))
      .select(col(Sname), col(Ts), col(Value))
    frame.copy(df = out, valueCols = Seq(Value), ordered = false)
  }
}

/** Mean of the previous `period` samples; NaN until the window fills. */
final class SmaForecast(period: Int) extends ColState {
  private val buf = new Array[Double](period)
  private var n = 0
  private var idx = 0
  private var sum = 0.0
  def step(x: Double): Double = {
    val f = if (n < period) Double.NaN else sum / period
    if (n < period) { buf(idx) = x; sum += x; n += 1 }
    else { sum += x - buf(idx); buf(idx) = x }
    idx = (idx + 1) % period
    f
  }
}

/** Simple exponential smoothing, seeded with the first observation. */
final class EwmaForecast(alpha: Double) extends ColState {
  private var s = Double.NaN
  def step(x: Double): Double = {
    val f = if (s.isNaN) x else s
    s = if (s.isNaN) x else alpha * x + (1 - alpha) * s
    f
  }
}

/** Double exponential smoothing (level + trend). */
final class DoubleExpForecast(alpha: Double, gamma: Double) extends ColState {
  private var level = Double.NaN
  private var trend = 0.0
  def step(x: Double): Double = {
    if (level.isNaN) { level = x; trend = 0.0; return x }
    val f = level + trend
    val prev = level
    level = alpha * x + (1 - alpha) * (level + trend)
    trend = gamma * (level - prev) + (1 - gamma) * trend
    f
  }
}

/** Additive Holt-Winters with season length `period`; seasonal components
  * seed to 0 and learn online. */
final class HoltWintersForecast(alpha: Double, beta: Double, gamma: Double,
                                period: Int) extends ColState {
  private val season = new Array[Double](period)
  private var level = Double.NaN
  private var trend = 0.0
  private var t = 0
  def step(x: Double): Double = {
    val si = t % period
    t += 1
    if (level.isNaN) { level = x; return x }
    val f = level + trend + season(si)
    val prev = level
    level = alpha * (x - season(si)) + (1 - alpha) * (level + trend)
    trend = beta * (level - prev) + (1 - beta) * trend
    season(si) = gamma * (x - level) + (1 - gamma) * season(si)
    f
  }
}

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
  * classes. The `approx` (CountMin sketch) variants exist in the
  * reference purely to bound memory — the distributed implementation is
  * exact, so `approx:true` is accepted and served by the same path.
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
    val Value = frame.valueCols.head
    // 1. per-series sequential forecast (partition-local state)
    val withF = Pipe.statefulColumn(frame, Value, "__forecast", mk)
    // 2. per-time-frame detection rule
    val err = abs(col(Value) - col("__forecast"))
    val f2 = sqrt(sum(when(isnan(err), 0.0).otherwise(err * err))
      .over(Window.partitionBy(col(Ts))))
    val df = withF
      .withColumn("__err", err)
      .withColumn("__f2", f2)
      .filter(!isnan(col("__err")) && col("__err") > col("__f2") * lit(threshold))
      .select(col(Sname), col(Ts), col(Value))
    frame.copy(df = df, valueCols = Seq(Value))
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

package graft

import graft.ast.QueryJson
import graft.plan.Planner

/** Forecast-based anomaly detection (revived reference anomaly.cpp
  * semantics: error > sqrt(F2) * threshold per time frame). */
class AnomalySpec extends SparkFunSuite {
  import SparkSpec._

  // 3 series, 20 regular samples; series C spikes at t=15
  private def fixtureStore = store(
    (0 until 20).flatMap { i =>
      Seq(
        ("m", Map("h" -> "A"), 1000000000L * i, 10.0),
        ("m", Map("h" -> "B"), 1000000000L * i, 20.0),
        ("m", Map("h" -> "C"), 1000000000L * i, if (i == 15) 500.0 else 30.0))
    })

  private def run(applyJson: String) = Planner.plan(QueryJson.parse(
    s"""{"select":"m","range":{"from":0,"to":100000000000},
       |"apply":[$applyJson]}""".stripMargin), fixtureStore).df

  test("ewma detector flags the planted spike (and only series C)") {
    val got = rows3(run(
      """{"name":"anomaly","method":"ewma","alpha":0.5,"threshold":0.5,"approx":false}"""))
    // the spike itself is flagged; the contaminated forecast may echo on
    // the recovery samples (faithful detector behavior) — but never on
    // the steady series
    assert(got.head == (("m h=C", 15000000000L, 500.0)))
    assert(got.forall(_._1 == "m h=C"))
    assert(got.forall(_._2 >= 15000000000L))
  }

  test("sma detector flags the spike after warmup (series C only)") {
    val got = rows3(run(
      """{"name":"anomaly","method":"sma","period":5,"threshold":0.5,"approx":false}"""))
    assert(got.head == (("m h=C", 15000000000L, 500.0)))
    assert(got.forall(_._1 == "m h=C"))
  }

  test("double-exp and holt-winters run and flag the spike") {
    val d = rows3(run(
      """{"name":"anomaly","method":"double-exp-smoothing","alpha":0.5,
        |"gamma":0.3,"threshold":0.5,"approx":false}""".stripMargin))
    assert(d.exists(r => r._1 == "m h=C" && r._2 == 15000000000L))
    val h = rows3(run(
      """{"name":"anomaly","method":"holt-winters","alpha":0.5,"beta":0.2,
        |"gamma":0.3,"period":4,"threshold":0.5,"approx":false}""".stripMargin))
    assert(h.exists(r => r._1 == "m h=C" && r._2 == 15000000000L))
  }

  test("approx:true runs the REAL CountMin pipeline and flags the spike") {
    // collision-free regime (3 series, K=1024 — K must exceed the spike
    // error: the reference F2 estimator K*f*e - f*e^2 goes NEGATIVE for a
    // single error e > K, sqrt -> NaN, and the frame silently detects
    // nothing, faithfully): the sketch detector's own
    // rule — median-of-rows estimate > sqrt(estimateF2) * threshold —
    // must flag the planted spike on series C and nothing on A/B
    val got = rows3(run(
      """{"name":"anomaly","method":"ewma","alpha":0.5,"threshold":0.5,
        |"approx":true,"bits":10,"hashes":3}""".stripMargin))
    assert(got.exists(r => r._1 == "m h=C" && r._2 == 15000000000L))
    assert(got.forall(_._1 == "m h=C"))
    // sketch parameter validation (reference validate_sketch_params)
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"ewma","alpha":0.5,"threshold":0.5,
        |"approx":true,"bits":7}""".stripMargin))
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"ewma","alpha":0.5,"threshold":0.5,
        |"approx":true,"hashes":4}""".stripMargin))
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"ewma","alpha":0.5,"threshold":0.5,
        |"approx":true,"hashes":11}""".stripMargin))
    // negative odd values must not slip through (-3 % 2 == -1)
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"ewma","alpha":0.5,"threshold":0.5,
        |"approx":true,"hashes":-3}""".stripMargin))
  }

  test("a NaN sample cannot silently disable a sketch frame") {
    // series D is all-NaN; the exact path zeroes NaN errors out of F2 and
    // the sketch path must do the equivalent — without the guard the NaN
    // poisons its cell in every row, all F2 estimates go NaN, and the
    // frame detects NOTHING (the C spike would be missed)
    val st = store((0 until 20).flatMap { i =>
      Seq(
        ("m", Map("h" -> "A"), 1000000000L * i, 10.0),
        ("m", Map("h" -> "C"), 1000000000L * i, if (i == 15) 500.0 else 30.0),
        ("m", Map("h" -> "D"), 1000000000L * i, Double.NaN))
    })
    val got = rows3(Planner.plan(QueryJson.parse(
      """{"select":"m","range":{"from":0,"to":100000000000},
        |"apply":[{"name":"anomaly","method":"ewma","alpha":0.5,
        |"threshold":0.5,"approx":true,"bits":10,"hashes":3}]}""".stripMargin),
      st).df)
    assert(got.exists(r => r._1 == "m h=C" && r._2 == 15000000000L))
    assert(got.forall(_._1 == "m h=C"))
  }

  test("sketch collisions merge series like the reference's tables") {
    // K=1024 with 3 series: the estimate for an untouched series rides on
    // its own cells, so a spike 100x the baseline cannot leak a false
    // positive onto A/B via the subtract-mean correction
    val got = rows3(run(
      """{"name":"anomaly","method":"sma","period":5,"threshold":0.5,
        |"approx":true,"bits":10,"hashes":3}""".stripMargin))
    assert(got.exists(r => r._1 == "m h=C" && r._2 == 15000000000L))
    assert(got.forall(_._1 == "m h=C"))
  }

  test("parameter validation mirrors the reference") {
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"psychic","threshold":0.5}"""))
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"ewma","threshold":0.5}""")) // alpha missing
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"ewma","alpha":1.5,"threshold":0.5}"""))
    intercept[IllegalArgumentException](run(
      """{"name":"anomaly","method":"sma","threshold":0.5}""")) // period missing
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ast.QueryJson
import graft.plan.{Planner, TsStore}

/** Giant-series skew (SURVEY §7.4 risk 5): per-series pipeline nodes
  * partition by sname, so ONE series with millions of points serializes
  * into one task. These tests document that the single-task path stays
  * LINEAR and spill-safe — window nodes use bounded running frames
  * (UnsafeExternalSorter spills past the buffer threshold) and the
  * stateful/sax nodes are one-pass iterators with O(1)/O(width) state —
  * rather than degrading quadratically or OOMing. Timings land on
  * stderr for the record; the assertion is a generous linearity bound,
  * not a microbenchmark. */
class SkewSpec extends SparkFunSuite {

  private val N = 10000000L // one 10M-point series, ts = i seconds, v = i
  private val T0 = 1700000000000000000L

  private lazy val store: TsStore = {
    val sp = spark
    val giant = sp.range(N).select(
      lit("giant").as("metric"),
      map(lit("host"), lit("g0")).as("tags"),
      (lit(T0) + col("id") * 1000000000L).as("ts"),
      col("id").cast("double").as("value"))
    new TsStore(giant)
  }

  private def q(json: String) =
    Planner.plan(QueryJson.parse(json), store).df

  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    Console.err.println(
      f"SKEW $label%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private val range = s""""range":{"from":$T0,"to":${T0 + N * 1000000000L}}"""

  test("10M-point single series: windowed rate stays linear") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"rate"}]}""".stripMargin)
    // dx/dt = 1.0 for every step after the first (ts step 1s, value step 1)
    val agg = timed("rate") {
      df.agg(count(lit(1)), sum(when(col("value") === 1.0, 1).otherwise(0)))
        .head()
    }
    assert(agg.getLong(0) == N)
    assert(agg.getLong(1) == N - 1)
  }

  test("10M-point single series: sma window stays linear") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"sma","window-width":10}]}""".stripMargin)
    // trailing-10 mean of a ramp is i - 4.5 once the window fills
    val agg = timed("sma") {
      df.filter(col("ts") >= T0 + 9L * 1000000000L)
        .agg(count(lit(1)),
          sum(when(col("value") === (col("ts") - T0) / 1e9 - 4.5, 1)
            .otherwise(0)))
        .head()
    }
    assert(agg.getLong(0) == N - 9)
    assert(agg.getLong(1) == N - 9)
  }

  test("10M-point single series: stateful ewma stays one-pass") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"ewma","decay":0.9}]}""".stripMargin)
    val n = timed("ewma")(df.count())
    assert(n == N)
  }

  test("10M-point single series: sax encodes one-pass with tiny output") {
    val df = q(s"""{"select":"giant",$range,
                  |"apply":[{"name":"sax","alphabet_size":5,"window_width":8}]}""".stripMargin)
    // every window of the ramp z-normalizes identically -> numerosity
    // reduction collapses the whole series to ONE word
    val rows = timed("sax")(df.collect())
    assert(rows.length == 1)
  }
}

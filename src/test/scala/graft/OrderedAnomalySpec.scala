package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamIngest

/** Event-time determinism of [[StreamIngest.streamingAnomalyOrdered]]
  * (VERDICT r11 #5): the unordered operator's EW trajectory depends on
  * how micro-batches split the arrival order — the 1000x ScaleCheck
  * measured 0.97% alert drift from `maxFilesPerTrigger` boundary
  * placement. The ordered variant buffers to the watermark and folds in
  * global (ts, value) order, so its alert set below the final watermark
  * must be IDENTICAL under any batch split and equal to the static
  * [[StreamIngest.anomalyBatchExact]] fold. The spec drives maximally
  * scrambled arrival (whole late half before the early half) and
  * asserts exact equality — and that the unordered operator does
  * diverge on the same arrival, documenting why the variant exists. */
class OrderedAnomalySpec extends SparkFunSuite {

  private val Base = 1700000000000000000L // ns
  private val Sec = 1000000000L

  /** One series whose two halves sit at DIFFERENT levels (100-ish then
    * 10-ish, a spike in each): in event-time order the level shift at
    * the half boundary is the anomaly; with the halves' arrival
    * swapped, the shift lands elsewhere — so the unordered operator's
    * alert SET, not just its trajectory, depends on arrival order. */
  private def rows: Seq[(String, Long, Double)] = {
    val vals = (0 until 60).map { i =>
      if (i == 20) 500.0
      else if (i == 45) 50.0
      else if (i < 30) { if (i % 2 == 0) 100.0 else 102.0 }
      else { if (i % 2 == 0) 10.0 else 12.0 }
    }
    vals.zipWithIndex.map { case (v, i) =>
      ("m", Base + i * Sec, v)
    }
  }

  private def lateHalf = rows.filter(_._2 >= Base + 30 * Sec)
  private def earlyHalf = rows.filter(_._2 < Base + 30 * Sec)
  // sentinels advance the global watermark past all real rows so the
  // buffered series flush via event-time timeouts; their own series is
  // filtered from every comparison
  private def sentinel(d: Int) = ("__wm", Base + d * 86400L * Sec, 0.0)

  private def collectAlerts(table: String): Seq[(Long, Double)] = {
    val sp = spark
    sp.sql(s"SELECT ts, value FROM $table WHERE sname NOT LIKE '__wm%' " +
        "ORDER BY ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  private def runStream(name: String, ordered: Boolean,
                        batches: Seq[Seq[(String, Long, Double)]])
      : Seq[(Long, Double)] = {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[(String, Long, Double)]
    val samples = input.toDF().toDF("metric", "ts", "value")
      .withColumn("tags", map(lit("h"), lit("a")))
    val alerts =
      if (ordered) StreamIngest.streamingAnomalyOrdered(samples,
        decay = 0.3, k = 2.5, warmup = 4, watermarkDelay = "10 minutes")
      else StreamIngest.streamingAnomaly(samples,
        decay = 0.3, k = 2.5, warmup = 4)
    val q = alerts.toDF("sname", "ts", "value", "ewma", "sigma")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try batches.foreach { b =>
      input.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    collectAlerts(name)
  }

  private lazy val exact: Seq[(Long, Double)] = {
    val sp = spark
    import sp.implicits._
    StreamIngest.anomalyBatchExact(
        rows.toDF("metric", "ts", "value")
          .withColumn("tags", map(lit("h"), lit("a"))),
        decay = 0.3, k = 2.5, warmup = 4)
      .toDF("sname", "ts", "value", "ewma", "sigma")
      .orderBy(col("ts"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
  }

  test("scrambled arrival folds in event-time order: alerts equal the " +
      "batch-exact fold") {
    assert(exact.nonEmpty, "fixture must produce alerts")
    // late half arrives FIRST, then the early half, then two sentinel
    // batches to advance the watermark and fire the flush timeouts
    val got = runStream("oanom_scrambled", ordered = true,
      Seq(lateHalf, earlyHalf, Seq(sentinel(1)), Seq(sentinel(2))))
    assert(got == exact,
      s"ordered stream diverged from batch fold:\n$got\nvs\n$exact")
  }

  test("single mega-batch arrival gives the identical alert set") {
    val got = runStream("oanom_single", ordered = true,
      Seq(rows, Seq(sentinel(1)), Seq(sentinel(2))))
    assert(got == exact)
  }

  test("the unordered operator DOES diverge on the same scrambled " +
      "arrival (the caveat the ordered variant removes)") {
    val got = runStream("oanom_unordered", ordered = false,
      Seq(lateHalf, earlyHalf))
    assert(got != exact,
      "fixture no longer demonstrates the arrival-order dependence")
  }

  test("a straggler whose ts EQUALS the watermark cannot perturb rows " +
      "already folded (r12 ADVICE boundary case: the fold treats only " +
      "STRICTLY-below-watermark rows as final, so whichever convention " +
      "the engine's late filter takes at the boundary — this version " +
      "drops the row; one that delivers it would fold it in order — " +
      "the alert trajectory stays a pure function of the accepted data)") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val T = Base + 9 * Sec
    // rows 0..8 stable ~100, row 9 a 500 spike AT the boundary ts; the
    // straggler is a second row at the SAME ts with a smaller value, so
    // the data-deterministic (ts, value) order folds it BEFORE the 500
    // — folding the 500 as final at wm == T would break the invariant
    val first = (0 until 9).map(i =>
      ("m", Base + i * Sec, if (i % 2 == 0) 100.0 else 102.0)) :+
      (("m", T, 500.0))
    val straggler = ("m", T, 100.0)
    // a row at T + delay lands the watermark EXACTLY at T
    val wmPush = ("__wm", T + 600 * Sec, 0.0)
    val input = MemoryStream[(String, Long, Double)]
    val samples = input.toDF().toDF("metric", "ts", "value")
      .withColumn("tags", map(lit("h"), lit("a")))
    val alerts = StreamIngest.streamingAnomalyOrdered(samples,
      decay = 0.3, k = 2.5, warmup = 4, watermarkDelay = "10 minutes")
    val q = alerts.toDF("sname", "ts", "value", "ewma", "sigma")
      .writeStream.format("memory").queryName("oanom_boundary")
      .outputMode(OutputMode.Append).start()
    try Seq(first :+ wmPush, Seq(straggler),
        Seq(sentinel(1)), Seq(sentinel(2))).foreach { b =>
      input.addData(b: _*)
      q.processAllAvailable()
    } finally q.stop()
    def tup(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val got = sp.sql(
      "SELECT ts, value, round(ewma, 6), round(sigma, 6) " +
        "FROM oanom_boundary WHERE sname NOT LIKE '__wm%' " +
        "ORDER BY ts, value").collect().map(tup).toSeq
    // the two folds an honest engine may produce: the straggler dropped
    // by the late filter (this Spark version's measured behavior at
    // exact equality), or delivered and folded in (ts, value) order.
    // The OLD `<=` partition could produce a third, broken trajectory:
    // the 500 folded as final at wm == T, then the delivered straggler
    // folded AFTER it — out of the data-deterministic order.
    def exactOn(data: Seq[(String, Long, Double)]) =
      StreamIngest.anomalyBatchExact(
          data.toDF("metric", "ts", "value")
            .withColumn("tags", map(lit("h"), lit("a"))),
          decay = 0.3, k = 2.5, warmup = 4)
        .toDF("sname", "ts", "value", "ewma", "sigma")
        .select(col("ts"), col("value"), round(col("ewma"), 6),
          round(col("sigma"), 6))
        .orderBy(col("ts"), col("value"))
        .collect().map(tup).toSeq
    val wantDropped = exactOn(first)
    val wantFolded = exactOn(first :+ straggler)
    assert(wantDropped.nonEmpty, "fixture must alert on the 500 spike")
    assert(wantDropped != wantFolded,
      "fixture no longer discriminates the straggler's fold position")
    assert(got == wantDropped || got == wantFolded,
      s"boundary straggler perturbed the fold out of order:\n$got\n" +
        s"vs dropped=$wantDropped\nvs folded=$wantFolded")
  }

  test("rows later than the watermark are dropped, not folded out of " +
      "order") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[(String, Long, Double)]
    val samples = input.toDF().toDF("metric", "ts", "value")
      .withColumn("tags", map(lit("h"), lit("a")))
    val alerts = StreamIngest.streamingAnomalyOrdered(samples,
      decay = 0.3, k = 2.5, warmup = 4, watermarkDelay = "10 minutes")
    val q = alerts.toDF("sname", "ts", "value", "ewma", "sigma")
      .writeStream.format("memory").queryName("oanom_late")
      .outputMode(OutputMode.Append).start()
    try {
      Seq(rows, Seq(sentinel(1)), Seq(sentinel(2))).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val flushed = collectAlerts("oanom_late")
      assert(flushed == exact)
      // a spike older than the watermark arrives after the flush: the
      // watermark filter drops it — no new alert, no state perturbation
      input.addData(("m", Base + 10 * Sec, 500.0))
      q.processAllAvailable()
      assert(collectAlerts("oanom_late") == flushed,
        "late row leaked past the watermark into the fold")
    } finally q.stop()
  }
}

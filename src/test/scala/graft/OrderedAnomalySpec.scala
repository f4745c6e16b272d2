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

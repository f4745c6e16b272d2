package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamIngest

/** Structured Streaming ingest + continuous aggregation
  * (reference behaviors: functests/test_continuous_queries.py). */
class StreamingSpec extends SparkFunSuite {

  test("streaming OpenTSDB parse + continuous group-aggregate") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[String]
    val parsed = StreamIngest.parseOpenTsdbStream(input.toDS())
    val agg = StreamIngest.continuousGroupAggregate(parsed,
      stepNs = 10L * 1000000000L)
    val query = agg.writeStream
      .format("memory").queryName("cga")
      .outputMode(OutputMode.Update)
      .start()
    try {
      // 4 points in bucket [1418197420s,1418197430s), 1 bad line dropped
      input.addData(
        "put cpu 1418197421 1.0 host=a",
        "put cpu 1418197423 3.0 host=a",
        "put cpu 1418197425 5.0 host=a",
        "put cpu 1418197429 7.0 host=a",
        "not a put line at all")
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT sname, bucket_ts, min, max, sum, count FROM cga").collect()
      assert(got.length == 1)
      val r = got.head
      assert(r.getString(0) == "cpu host=a")
      assert(r.getLong(1) == 1418197420L * 1000000000L)
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 7.0)
      assert(r.getDouble(4) == 16.0 && r.getLong(5) == 4L)
    } finally query.stop()
  }

  test("streaming EWMA keeps per-series state across micro-batches") {
    val sp = spark
    implicit val sqlCtx = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[String]
    val parsed = StreamIngest.parseOpenTsdbStream(input.toDS())
    val ewma = StreamIngest.streamingEwma(parsed, decay = 0.5)
    val query = ewma.toDF("sname", "forecast").writeStream
      .format("memory").queryName("sewma")
      .outputMode(OutputMode.Update)
      .start()
    try {
      // warmup < 10 samples: forecast equals the current value
      input.addData((1 to 3).map(i => s"put m $i $i.0 host=a"): _*)
      query.processAllAvailable()
      val b1 = spark.sql("SELECT forecast FROM sewma").collect()
      assert(b1.last.getDouble(0) == 3.0)
      input.addData("put m 4 9.0 host=a")
      query.processAllAvailable()
      // state persisted: still in warmup, forecast = current value
      val b2 = spark.sql("SELECT forecast FROM sewma").collect()
      assert(b2.last.getDouble(0) == 9.0)
    } finally query.stop()
  }
}

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

  test("checkpointed layout sink survives restart without duplicates") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-stream").toFile
    val in = new java.io.File(dir, "in"); in.mkdirs()
    val out = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def writeBatch(name: String, lines: Seq[String]): Unit =
      Files.write(new java.io.File(in, name).toPath, lines.mkString("\n").getBytes)
    def startQuery() = {
      val lines = spark.readStream.textFile(in.getAbsolutePath)
      val parsed = StreamIngest.parseOpenTsdbStream(lines)
      StreamIngest.writeLayoutStream(parsed, out, ckpt).start()
    }
    writeBatch("b1.txt", (0 until 5).map(i => s"put cpu ${1000 + i} $i.0 host=a"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 5)
    // restart from the same checkpoint; only the new file is processed
    writeBatch("b2.txt", (5 until 8).map(i => s"put cpu ${1000 + i} $i.0 host=a"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 8) // exactly once: no replay of batch 1
    assert(rows.select("ts").distinct().count() == 8)
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

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: every gated query at SPARK_GRAFT_SF_DIR, plus an
  * ingestion-throughput microbench against BASELINE.md's write numbers.
  * Failures are reported as explicit error markers (value -1, message in
  * "errors") — never as a fast wall-time. Output: ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.Map[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(120)
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }

    // Ingestion throughput: generate samples in-memory, parse-format them
    // through the writer layout path, measure samples/s (BASELINE.md rows
    // 1-3 are write throughput).
    val n = 2000000L
    val tIn = System.nanoTime()
    val ingested = spark.range(n).select(
      concat(lit("cpu"), (col("id") % 10).cast("string")).as("metric"),
      map(lit("host"), concat(lit("h"), (col("id") % 100).cast("string"))).as("tags"),
      (lit(1700000000000000000L) + col("id") * 1000000L).as("ts"),
      (col("id") % 1000).cast("double").as("value"),
      lit(null).cast("string").as("event"))
    val cnt = ingested.selectExpr("max(ts)", "count(*)").collect()(0).getLong(1)
    val ingestSec = (System.nanoTime() - tIn) / 1e9
    val ingestRate = cnt / ingestSec

    val okResults = results.filter(_._2 >= 0)
    val total = okResults.map(_._2).sum
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"${v.replace("\"", "'")}"""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"n_ok":${okResults.size},"n_failed":${errors.size},""" +
      s""""ingest_samples_per_sec":$ingestRate,"sf":"$sfDir"}""")
    spark.stop()
  }
}

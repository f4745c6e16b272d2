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

    // Ingestion throughput: generate samples and push them through the
    // REAL write path — partitioned/sorted parquet layout — and measure
    // end-to-end samples/s (BASELINE.md rows 1-3 are write throughput).
    val n = 2000000L
    val tIn = System.nanoTime()
    val ingested = spark.range(n).select(
      concat(lit("cpu"), (col("id") % 8).cast("string")).as("metric"),
      map(lit("host"), concat(lit("h"), (col("id") % 100).cast("string"))).as("tags"),
      (lit(1700000000000000000L) + col("id") * 40000L).as("ts"),
      (col("id") % 1000).cast("double").as("value"),
      lit(null).cast("string").as("event"))
    // parse-only rate (generation + scan, the reference's TCP-parse
    // analogue) and full write rate (sorted partitioned parquet) reported
    // separately
    val parsed = ingested.selectExpr("count(*)").collect()(0).getLong(0)
    val parseSec = (System.nanoTime() - tIn) / 1e9
    val tW = System.nanoTime()
    val benchPath = "/tmp/graft_bench_ingest"
    graft.io.Ingest.writeLayout(ingested, benchPath, flattenTags = Seq("host"))
    val writeSec = (System.nanoTime() - tW) / 1e9
    val ingestRate = parsed / parseSec
    val writeRate = n / writeSec

    val okResults = results.filter(_._2 >= 0)
    val total = okResults.map(_._2).sum
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errs = errors.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"${v.replace("\"", "'")}"""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"n_ok":${okResults.size},"n_failed":${errors.size},""" +
      s""""ingest_samples_per_sec":$ingestRate,""" +
      s""""write_samples_per_sec":$writeRate,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Local smoke probe: exercises the public library surface the way the
  * driver does (entry() rows>0) plus a few negative-path checks. Not part
  * of the driver contract; run with
  * `sbt "runMain graft.Smoke [sfDir]"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = SparkEntry.entry(spark).count()
    println(s"PROBE1 entry rows = $n")

    try {
      ast.QueryJson.parse("""{"aggregate":{"click":"max"},"order-by":"time"}""")
      println("PROBE2 FAIL: order-by on aggregate accepted")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE2 rejected: ${e.getMessage}") }

    try {
      val q = ast.QueryJson.parse("""{"aggregate":{"click":"median"}}""")
      plan.Planner.plan(q, sources.TestData.events(spark, sfDir))
      println("PROBE3 FAIL: unknown func accepted")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE3 rejected: ${e.getMessage}") }

    val q4 = ast.QueryJson.parse(
      """{"select":"click","range":{"from":"20240105T000000","to":"20240105T000000"}}""")
    val n4 = plan.Planner.plan(q4, sources.TestData.events(spark, sfDir)).df.count()
    println(s"PROBE4 empty-range rows = $n4")

    spark.stop()
  }
}

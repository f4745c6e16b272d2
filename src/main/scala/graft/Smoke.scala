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

    // order-by on aggregate: accepted and ignored (reference
    // parse_aggregate_query never reads it; output stays series-ordered)
    try {
      val q = ast.QueryJson.parse(
        """{"aggregate":{"click":"max"},"order-by":"time"}""")
      println(s"PROBE2 order-by on aggregate ignored (kind=${q.kind.getClass.getSimpleName})")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE2 FAIL: order-by on aggregate rejected: ${e.getMessage}") }

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

    // eval: unknown variable must raise the reference's error text
    try {
      val q = ast.QueryJson.parse(
        """{"join":["click","view"],"range":{"from":"20240105T000000","to":"20240120T000000"},
          |"apply":[{"name":"eval","expr":"click + nosuch"}]}""".stripMargin)
      plan.Planner.plan(q, sources.TestData.events(spark, sfDir))
      println("PROBE5 FAIL: unknown eval variable accepted")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE5 rejected: ${e.getMessage}") }

    // eval: malformed expression
    try {
      val q = ast.QueryJson.parse(
        """{"join":["click","view"],"range":{"from":"20240105T000000","to":"20240120T000000"},
          |"apply":[{"name":"eval","expr":"click + * view"}]}""".stripMargin)
      plan.Planner.plan(q, sources.TestData.events(spark, sfDir))
      println("PROBE6 FAIL: malformed expr accepted")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE6 rejected: ${e.getMessage}") }

    // suggest: unknown select target
    try {
      plan.Meta.suggest(sources.TestData.events(spark, sfDir),
        """{"select":"nope"}""")
      println("PROBE7 FAIL: bad suggest accepted")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE7 rejected: ${e.getMessage}") }

    // sax: out-of-range params
    try {
      val q = ast.QueryJson.parse(
        """{"select":"view","range":{"from":"20240105T000000","to":"20240120T000000"},
          |"apply":[{"name":"sax","alphabet_size":99,"window_width":4}]}""".stripMargin)
      plan.Planner.plan(q, sources.TestData.events(spark, sfDir))
      println("PROBE8 FAIL: alphabet 99 accepted")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE8 rejected: ${e.getMessage}") }

    // frequent-items: error=0 must be rejected (division guard)
    try {
      val q = ast.QueryJson.parse(
        """{"select":"view","range":{"from":"20240105T000000","to":"20240120T000000"},
          |"apply":[{"name":"frequent-items","error":0.0,"portion":0.1}]}""".stripMargin)
      plan.Planner.plan(q, sources.TestData.events(spark, sfDir))
      println("PROBE9 FAIL: error=0 accepted")
    } catch { case e: IllegalArgumentException =>
      println(s"PROBE9 rejected: ${e.getMessage}") }

    // CSV formatter round-trip sanity on a tiny frame
    val f = plan.Planner.plan(ast.QueryJson.parse(
      """{"select":"click","range":{"from":"20240105T000000","to":"20240106T000000"},"limit":3}"""),
      sources.TestData.events(spark, sfDir))
    serve.OutputFormat.csv(f).collect().foreach(l => println(s"PROBE10 csv: $l"))

    spark.stop()
  }
}

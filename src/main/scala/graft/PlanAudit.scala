package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of named gates (all gates if none
  * named) with exchange/broadcast counts — the `.explain` audit loop the
  * build process runs after each operator lands. Usage:
  *   runMain graft.PlanAudit <sfDir> [gate ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"===== $q =====")
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        val t0 = System.nanoTime()
        val plan = df.queryExecution.executedPlan.toString
        val planMs = (System.nanoTime() - t0) / 1000000L
        val exchanges = "Exchange hash|Exchange range".r.findAllIn(plan).size
        val bcasts = "BroadcastExchange".r.findAllIn(plan).size
        val (pRead, pTotal) = Bench.partitionPruning(df)
        println(s"shuffle-exchanges=$exchanges broadcasts=$bcasts" +
          s" plan_ms=$planMs" +
          (if (pTotal > 0) s" partitions=$pRead/$pTotal" else ""))
        println(plan.linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("Join") ||
          l.contains("Window") || l.contains("PushedFilters"))
          .mkString("\n"))
      } catch { case e: Throwable =>
        println(s"[audit] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 dev probe: interleaved A/B of `spark.sql.shuffle.partitions`
  * values over the streaming gates, in one JVM. Streaming state-store
  * commit count is proportional to the shuffle-partition count at
  * stream start (state partitions are fixed by the first batch), so a
  * session constant sized for the 32-core batch engine pays 32 state
  * commits per micro-batch on streams whose key cardinality is ~8
  * (VERDICT r14 #4). Usage: runMain graft.StreamProbe <sfDir> <reps> <gate...>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val gates = { val g = args.drop(2).toSeq
      if (g.nonEmpty) g
      else Seq("ts_anomaly_stream_ordered", "ts_anomaly_stream",
        "ts_rollup_stream", "doc_dedup_stream") }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).select(sum(col("id"))).head()
    val pvals = sys.env.get("STREAM_PROBE_PARTS")
      .map(_.split(",").toSeq).getOrElse(Seq(cpus, "8"))
    for (g <- gates; rep <- 0 until reps; p <- pvals) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val t0 = System.nanoTime()
      val n = Bench.timedTerminal(g, SparkEntry.queries(g)(spark, d))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$g%-28s p=$p%-3s rep$rep $dt%7.3f s rows=$n")
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
    }
    spark.stop()
  }
}

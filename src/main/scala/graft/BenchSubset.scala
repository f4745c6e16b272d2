package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused re-timer for a subset of gates: the full [[Bench]] runs all
  * 218 queries back-to-back, so a single number carries whatever GC/JIT
  * state the previous 100 queries left behind. When the official run
  * flags a query >2x its cross-run floor, this tool answers "is that the
  * plan or the neighborhood?" — each named query runs `reps` passes in a
  * fresh-warmed session and reports min/median, which either reproduces
  * the floor (noise: root cause is bench neighborhood) or doesn't (real:
  * go read the plan).
  *
  * Usage: runMain graft.BenchSubset [sfDir] [reps] name...
  * Prints one JSON line
  * {"metric":"bench_subset","queries":{name:{"min":s,"median":s}}}
  * plus per-pass stderr lines.
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: BenchSubset sfDir reps name...")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown gate(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        "2")
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same engine warmup as Bench: codegen/shuffle init must not land on
    // the first named query's pass 1
    import spark.implicits._
    spark.range(1000000).select(sum(col("id"))).head()
    Seq(("w", 1)).toDF("a", "b").repartition(2, col("a"))
      .groupBy("a").agg(sum(col("b"))).count()
    val stats = names.map { name =>
      val times = (0 until reps).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Console.err.println(f"[subset] $name%-32s pass$i $dt%7.3f s")
        dt
      }
      val sorted = times.sorted
      val median =
        if (reps % 2 == 1) sorted(reps / 2)
        else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
      name -> ((times.min, median))
    }
    println(stats.map { case (k, (mn, md)) =>
      f""""$k":{"min":$mn%.3f,"median":$md%.3f}"""
    }.mkString("""{"metric":"bench_subset","queries":{""", ",", "}}"))
    spark.stop()
  }
}

package graft

/** Perf harness: time the heavy gated queries at sf0.1 after the
  * let-binding fix (winnow was 350s, minhash 10.6s, jaccard 10.3s,
  * simhash 4.7s, embed_neardup_lsh 7.4s, ann_topk_ivf 10.0s). */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val heavy = if (args.nonEmpty) args.toSeq
      else Seq("doc_winnow", "doc_minhash_lsh", "doc_ngram_jaccard",
        "doc_simhash", "embed_neardup", "embed_neardup_lsh", "ann_topk",
        "ann_topk_lsh", "ann_topk_ivf", "doc_chunks", "doc_langid")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    val unknown = heavy.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown gate name(s): ${unknown.mkString(", ")}")
    for (name <- heavy) {
      if (explain) {
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, d).explain("formatted")
      }
      // the builder runs INSIDE the timer: several gates do real Spark
      // work there (writeIvf, query-vector collects), and past sessions'
      // numbers counted it
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(name)(spark, d).count()
      println(f"HEAVY $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($cnt rows)")
    }
    spark.stop()
  }
}

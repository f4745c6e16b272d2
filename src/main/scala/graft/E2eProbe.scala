package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.TestData

/** r15 dev probe: per-stage wall breakdown of the embed_e2e_serving
  * gate (the round's most expensive single gate, 6.8–7.4 s, never
  * plan-read before — VERDICT r14 #3). Replays the gate body with a
  * timer around each stage so the residue can be attributed to layout
  * write / append / reconciliation IO vs the semantic dedup + cluster
  * compute. Usage: runMain graft.E2eProbe <sfDir> <reps>
  */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise codegen/shuffle/parquet paths once
    spark.range(1000000).select(sum(col("id"))).head()
    for (rep <- 0 until reps) {
      val t00 = System.nanoTime()
      var last = t00
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"E2E rep$rep $name%-14s ${(now - last) / 1e9}%7.3f s")
        last = now
      }
      val emb = TestData.table(spark, d, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_e2e_probe").toString + "/layout"
      val profile = graft.llm.EmbedProfile.serving.copy(kmeansIters = 1)
      val init = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
        .select(graft.llm.Embed.normalized(col("embedding")))
        .collect().toSeq.map(_.getSeq[Double](0).toSeq)
      lap("init_collect")
      val cents = profile.trainCentroids(emb, k = 4, init = Some(init))
        .map(_.map(x => BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      lap("train")
      profile.writeLayout(emb.filter(col("vec_id") % 2 === 0), tmp,
        nCentroids = 4, centroids = Some(cents))
      lap("write_layout")
      profile.append(emb.filter(col("vec_id") % 2 =!= 0), tmp,
        batchId = Some("e2e_b1"))
      lap("append")
      val stored = spark.read.parquet(tmp)
      require(stored.count() == emb.count(), "row reconcile failed")
      lap("count_reconcile")
      val flat = emb.select(col("vec_id"),
        element_at(graft.functions.VecMath.centroidTopCells(
          col("embedding"), cents, 1, rounded = true), 1).as("__want"))
      require(stored.select(col("vec_id"), col("ivf_cell"))
        .join(flat, "vec_id")
        .filter(col("ivf_cell") =!= col("__want")).count() == 0,
        "routing reconcile failed")
      lap("route_reconcile")
      val corpus = stored.select(col("vec_id"), col("embedding"))
      val survivors = profile.semDedup(corpus, cents, threshold = 0.4)
        .select(col("vec_id")).localCheckpoint()
      lap("semdedup")
      val kept = corpus.join(survivors, Seq("vec_id"), "left_semi")
      val graph = profile.knnGraph(kept, k = 3, cents).localCheckpoint()
      lap("knn_graph")
      val e = graph.select(col("qid"), col("neighbor_id"))
      val mutual = e.alias("l")
        .join(e.alias("r"),
          col("l.qid") === col("r.neighbor_id") &&
            col("l.neighbor_id") === col("r.qid"))
        .filter(col("l.qid") < col("l.neighbor_id"))
        .select(col("l.qid").as("a"), col("l.neighbor_id").as("b"))
        .localCheckpoint()
      lap("mutual_join")
      val cc = graft.llm.Dedup.connectedComponents(mutual)
        .select(col("node").as("vec_id"), col("component").as("cluster"))
      val out = cc.orderBy(col("vec_id"))
      val n = Bench.forceTimed(out)
      lap("cc+terminal")
      println(f"E2E rep$rep TOTAL          ${(last - t00) / 1e9}%7.3f s  rows=$n")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TestData
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** r14 dev probe: interleaved A/B of connectedComponents loop shapes on
  * the REAL gate edge frames, in one JVM — the only reliable comparison
  * on a noisy-neighbor host. Also counts jobs/stages per run (a
  * deterministic plan-weight signal timing noise can't fake).
  * Usage: runMain graft.OptProbe <sfDir> <reps>
  */
object OptProbe {
  @volatile var jobs = 0
  @volatile var stages = 0
  @volatile var tasks = 0

  def ccLoop(pairs: DataFrame, variant: String, maxIter: Int = 30): DataFrame = {
    import graft.functions.Lineage.barrier
    val sym = pairs.select(col("a").as("u"), col("b").as("v"))
      .union(pairs.select(col("b").as("u"), col("a").as("v")))
    val edges = barrier(sym)
    var labels = barrier(edges.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u").as("node"), least(col("u"), col("mn")).as("label")))
    var prevSig: Option[(Long, Long)] = None
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val merged = variant match {
        case "old" =>
          val prop = edges
            .join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(col("u")).agg(min(col("label")).as("nl"))
            .withColumnRenamed("u", "node")
          labels.join(prop, Seq("node"), "left")
            .select(col("node"),
              least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        case "fused" =>
          edges.join(labels.withColumnRenamed("node", "v"), "v")
            .select(col("u"), col("label"))
            .union(labels.select(col("node").as("u"), col("label")))
            .groupBy(col("u")).agg(min(col("label")).as("label"))
            .withColumnRenamed("u", "node")
      }
      def jump(df: DataFrame): DataFrame =
        df.join(df.select(col("node").as("label"), col("label").as("ll")),
            Seq("label"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
      val jumped = barrier(jump(merged))
      val sig = jumped
        .agg(count(lit(1)), bit_xor(xxhash64(col("node"), col("label")))).head()
      val cur = (sig.getLong(0), if (sig.isNullAt(1)) 0L else sig.getLong(1))
      done = prevSig.contains(cur)
      prevSig = Some(cur)
      labels = jumped
      iter += 1
    }
    Console.err.println(s"  [cc] variant=$variant iters=$iter")
    labels.withColumnRenamed("label", "component")
  }

  /** The r14 shipping loop (neighbor-min + pointer jump on
    * co-partitioned RDDs), kept verbatim as the A/B baseline after the
    * r15 star-contraction port replaced it in Dedup. */
  def ccPointerJump(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val sym = pairs.select(col("a"), col("b")).as[(Long, Long)]
      .rdd.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
    val nSym = sym.cache().count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(nSym / 500000L + 1,
        sc.defaultParallelism.toLong * 2)).toInt)
    val edges = sym.partitionBy(p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
      .mapPartitions(_.map { case (u, mn) => (u, math.min(u, mn)) },
        preservesPartitioning = true)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var prevSig: Option[(Long, Long)] = None
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val msgs = edges.join(labels)
        .map { case (_, (v, lu)) => (v, lu) }
      val merged = msgs.union(labels).reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
      val jmap = merged.map { case (n, l) => (l, n) }.partitionBy(p)
      val jumped = jmap.join(merged)
        .map { case (l, (n, ll)) => (n, math.min(l, ll)) }
        .partitionBy(p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sig = jumped.mapPartitions { it =>
        var n = 0L; var h = 0L
        it.foreach { case (node, label) =>
          n += 1
          h ^= scala.util.hashing.byteswap64(node * 0x9e3779b97f4a7c15L
            + label)
        }
        Iterator((n, h))
      }.fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b ^ d) }
      if (iter == 0) sym.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      done = prevSig.contains(sig)
      prevSig = Some(sig)
      labels = jumped
      iter += 1
    }
    Console.err.println(s"  [cc] variant=r14jump iters=$iter")
    val out = labels.toDF("node", "component")
    edges.unpersist(blocking = false)
    out
  }

  /** r15 candidate: alternating large-star/small-star contraction
    * (Kiveris et al., SoCC'14) on co-partitioned RDDs — rounds scale
    * with log(diameter-ish) instead of diameter. Self-contained copy
    * for interleaved A/B against the shipping ccLong before porting. */
  def ccStar(pairs: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val raw = pairs.select(col("a"), col("b")).rdd.flatMap { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
      else Iterator((r.getLong(0), r.getLong(1)))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRaw = raw.count()
    val p = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(2 * nRaw / 500000L + 1,
        sc.defaultParallelism.toLong * 2)).toInt)
    def dedupP(rdd: org.apache.spark.rdd.RDD[(Long, Long)])
        : org.apache.spark.rdd.RDD[(Long, Long)] =
      rdd.partitionBy(p).mapPartitions({ it =>
        // exact dedup (a dropped DISTINCT edge could split a component,
        // so no hash shortcuts); same-key pairs all land in this
        // partition, so per-partition dedup is global for the pair
        val seen = scala.collection.mutable.HashSet[(Long, Long)]()
        it.filter(seen.add)
      }, preservesPartitioning = true)
    val nodes = dedupP(raw.flatMap { case (a, b) =>
      Iterator((a, a), (b, b)) })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var edges = dedupP(raw.flatMap { case (a, b) =>
      if (a == b) Iterator.empty else Iterator((a, b), (b, a)) })
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def largeStar(e: org.apache.spark.rdd.RDD[(Long, Long)]) = {
      val m = e.reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
        .mapPartitions(_.map { case (u, mn) => (u, math.min(u, mn)) },
          preservesPartitioning = true)
      dedupP(e.join(m).flatMap { case (u, (v, mu)) =>
        if (v > u) Iterator((v, mu), (mu, v)) else Iterator.empty })
    }
    def smallStar(e: org.apache.spark.rdd.RDD[(Long, Long)]) = {
      val sm = e.filter { case (u, v) => v < u }
      val m = sm.reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
      dedupP(sm.join(m).flatMap { case (u, (v, mu)) =>
        if (v == mu) Iterator((u, mu), (mu, u))
        else Iterator((v, mu), (mu, v)) })
    }
    var prevSig: Option[(Long, Long)] = None
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = smallStar(largeStar(edges))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sig = next.mapPartitions { it =>
        var n = 0L; var h = 0L
        it.foreach { case (u, v) =>
          n += 1
          h ^= scala.util.hashing.byteswap64(u * 0x9e3779b97f4a7c15L + v)
        }
        Iterator((n, h))
      }.fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b ^ d) }
      if (iter == 0) raw.unpersist(blocking = false)
      edges.unpersist(blocking = false)
      done = prevSig.contains(sig)
      prevSig = Some(sig)
      edges = next
      iter += 1
    }
    if (!done) throw new IllegalStateException(
      s"ccStar did not converge in $maxIter rounds")
    val star = edges.filter { case (u, v) => v < u }
      .reduceByKey(p, (x: Long, y: Long) => math.min(x, y))
    val labels = nodes.leftOuterJoin(star)
      .map { case (n, (_, m)) => (n, m.getOrElse(n)) }
    val out = labels.toDF("node", "component").localCheckpoint()
    nodes.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    (out, iter)
  }

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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    // real gate edge shapes, materialized once so every rep times ONLY CC
    val docs = TestData.table(spark, d, "documents")
    val emb = TestData.table(spark, d, "embeddings")
    val lshPairs = graft.llm.Dedup.minhashLsh(docs,
      n = 3, bands = 64, rowsPerBand = 2, threshold = 0.5)
      .select(col("a"), col("b")).localCheckpoint()
    Console.err.println(s"lsh edges: ${lshPairs.count()}")
    val init = emb.filter(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(graft.llm.Embed.normalized(col("embedding")))
      .collect().toSeq.map(_.getSeq[Double](0).toSeq)
    val step = graft.llm.Embed.kmeansStep(emb, init)
      .select(col("cell"), col("dim"), round(col("m"), 6).as("m")).collect()
    val byCell = step.groupBy(_.getInt(0))
    val cents = init.indices.map(c => byCell.get(c).fold(init(c))(
      rs => rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq))
    val g = graft.llm.Embed.knnGraphCells(emb, k = 3, cents, probes = 2)
    val e = g.select(col("qid"), col("neighbor_id"))
    val knnMutual = e.alias("l")
      .join(e.alias("r"),
        col("l.qid") === col("r.neighbor_id") &&
          col("l.neighbor_id") === col("r.qid"))
      .filter(col("l.qid") < col("l.neighbor_id"))
      .select(col("l.qid").as("a"), col("l.neighbor_id").as("b"))
      .localCheckpoint()
    Console.err.println(s"knn mutual edges: ${knnMutual.count()}")

    for ((name, pairs) <- Seq("lsh" -> lshPairs, "knn" -> knnMutual);
         rep <- 0 until reps; v <- Seq("r14", "star")) {
      val (j0, s0) = (jobs, stages)
      val t0 = System.nanoTime()
      val out = v match {
        case "r14"  => ccPointerJump(pairs)
        case "star" => graft.llm.Dedup.connectedComponents(pairs)
      }
      val n = out.agg(count(lit(1)),
        bit_xor(xxhash64(col("node"), col("component")))).head()
      val dt = (System.nanoTime() - t0) / 1e9
      val rounds =
        if (v == "star") graft.llm.Dedup.lastCcRounds.get() else -1
      println(f"$name%-4s $v%-6s rep$rep $dt%7.3f s  jobs=${jobs - j0}%3d " +
        f"stages=${stages - s0}%4d rounds=$rounds%3d " +
        f"rows=${n.getLong(0)} sig=${n.getLong(1)}%x")
    }
    spark.stop()
  }
}

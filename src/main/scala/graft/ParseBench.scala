package graft

import org.apache.spark.sql.functions._

import graft.io.{Ingest, LineProtocol}

/** Ingest-path profiling harness: decomposes the wire-to-storage pipeline
  * into stages so regressions are attributable. Findings that shaped
  * [[graft.io.Ingest]] / [[Bench]] (all measured here, 8M samples, 32
  * threads, this container):
  *
  *  - the RESP cursor parser itself runs >100M samples/s across 32
  *    plain JVM threads (~2-3M/s single-thread) — parsing is NOT the
  *    ingest bottleneck and never was;
  *  - reader choice dominates the parse stage: wholeTextFiles
  *    (Hadoop Text decode) ~19M samples/s, binaryFiles + String(UTF_8)
  *    ~36M/s, raw NIO reads ~85M/s; Ingest.sessionFiles uses
  *    binaryFiles (portable to HDFS/S3, 2x the Text path);
  *  - row materialization dominates the write path's head: the
  *    object-encoder was 4x, GenericInternalRow (Object[] + boxed
  *    ts/value per sample) 2.2x slower than the adopted
  *    UnsafeRowWriter emission. It is storage-write work, so Bench
  *    charges it to the write metric and measures parse at the RDD
  *    level;
  *  - of the full write path, the shuffle adds ~0.8s, the in-partition
  *    sort ~0.8s, and parquet encode ~1.1s on top of ~1.2s of row
  *    materialization.
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/tmp/graft_parsebench_resp")
    val n = 8000000L
    val sessions = 32
    Bench.renderRespSessions(dir, n, sessions)
    val files = dir.listFiles().sorted.map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
    val per = n / sessions

    def time[A](label: String)(f: => A): Unit = {
      f // warmup
      var best = Double.MaxValue
      for (_ <- 0 until 2) {
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"STAGE $label%-28s ${best}%6.2f s  ${n / best / 1e6}%6.2f M/s")
    }

    // 1. single-thread raw parse of ONE session
    locally {
      val content = files(0)
      var best = Double.MaxValue
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        val it = LineProtocol.parseRespText(content)
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        require(c == per)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"STAGE single-thread-parse        ${best}%6.2f s  ${per / best / 1e6}%6.2f M/s")
    }

    // 2. 32 plain JVM threads, raw parse (the parser's own ceiling).
    // Counts are checked on the MAIN thread after join: a require inside
    // a spawned thread would be swallowed by the default handler and the
    // stage would report a bogus (faster) rate from the dead thread.
    time("32-threads-parse") {
      val total = new java.util.concurrent.atomic.AtomicLong()
      val ts = files.map { content =>
        new Thread(() => {
          val it = LineProtocol.parseRespText(content)
          var c = 0L
          while (it.hasNext) { it.next(); c += 1 }
          total.addAndGet(c)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      require(total.get() == n, s"threaded parse dropped rows: ${total.get()}")
    }

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 3. distributed read+decode, then read+decode+parse (Bench's metric)
    locally {
      val rdd = spark.sparkContext.wholeTextFiles(dir.getPath, sessions)
      println(s"STAGE wholeTextFiles partitions = ${rdd.getNumPartitions}")
      time("spark-read-decode-only") {
        require(rdd.map(_._2.length.toLong).sum() > 0)
      }
      time("spark-read-parse") {
        require(rdd.mapPartitions { it =>
          var c = 0L
          it.foreach { case (_, content) =>
            val ps = LineProtocol.parseRespText(content)
            while (ps.hasNext) { ps.next(); c += 1 }
          }
          Iterator.single(c)
        }.sum().toLong == n)
      }
    }

    // 3b. alternative readers for the same read+decode+parse stage
    locally {
      val bin = spark.sparkContext.binaryFiles(dir.getPath, sessions)
      time("spark-binaryFiles-parse") {
        require(bin.mapPartitions { it =>
          var c = 0L
          it.foreach { case (_, pds) =>
            val content = new String(pds.toArray(),
              java.nio.charset.StandardCharsets.UTF_8)
            val ps = LineProtocol.parseRespText(content)
            while (ps.hasNext) { ps.next(); c += 1 }
          }
          Iterator.single(c)
        }.sum().toLong == n)
      }
      val names = dir.listFiles().map(_.getAbsolutePath).sorted
      val rddPaths = spark.sparkContext.parallelize(names.toSeq, sessions)
      time("spark-nio-read-parse") {
        require(rddPaths.mapPartitions { it =>
          var c = 0L
          it.foreach { p =>
            val content = new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(p)),
              java.nio.charset.StandardCharsets.UTF_8)
            val ps = LineProtocol.parseRespText(content)
            while (ps.hasNext) { ps.next(); c += 1 }
          }
          Iterator.single(c)
        }.sum().toLong == n)
      }
    }

    // 4. Dataset layer (row materialization) and the write-path stages
    def flat() = Ingest.respFilesFlat(spark, dir.getPath, Seq("host"), sessions)
    def withDay() = flat().withColumn("day", expr("ts div 86400000000000"))
    time("spark-dataset-count") {
      require(flat().count() == n)
    }
    time("w1-rows-noop") {
      flat().write.format("noop").mode("overwrite").save()
    }
    time("w2-repartition-noop") {
      withDay()
        .repartition(col("metric"), col("day"),
          pmod(xxhash64(col("sname")), lit(32)))
        .write.format("noop").mode("overwrite").save()
    }
    time("w3-sort-noop") {
      withDay()
        .repartition(col("metric"), col("day"),
          pmod(xxhash64(col("sname")), lit(32)))
        .sortWithinPartitions(col("metric"), col("day"), col("sname"), col("ts"))
        .write.format("noop").mode("overwrite").save()
    }
    time("w4-full-parquet-exchange") {
      Ingest.ingestResp(spark, dir.getPath, "/tmp/graft_parsebench_out",
        flattenTags = Seq("host"), minPartitions = sessions, exchange = true)
    }
    // shuffle-free sorted-run write (the ingest default): parse + local
    // sort + partitioned parquet fused into one stage
    time("w5-full-parquet-sortedrun") {
      Ingest.ingestResp(spark, dir.getPath, "/tmp/graft_parsebench_out",
        flattenTags = Seq("host"), minPartitions = sessions)
    }
    // the run-log spool (the adopted ingest write path, WAL-then-tree):
    // parse -> delta-encoded run files, no shuffle/sort/columnar encode.
    // Each rep wipes the spool dir first (inside the timer, ~ms): without
    // it every rep/run would append another full corpus of run files
    time("w6-runlog-spool") {
      val spool = new java.io.File("/tmp/graft_parsebench_spool")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(spool)
      require(graft.io.RunLog.spoolResp(spark, dir.getPath,
        spool.getPath, Seq("host"), sessions) == n)
    }
    // codec comparison on the sorted-run path (lz4_raw/no-dict is the
    // adopted default — measured faster AND smaller than snappy/dict;
    // zstd smallest, encode speed within noise of snappy)
    def sizeOf(p: String): Long = {
      def rec(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(rec).sum else f.length()
      rec(new java.io.File(p))
    }
    for (codec <- Seq("snappy", "zstd")) {
      val out = s"/tmp/graft_parsebench_out_$codec"
      time(s"w5-codec-$codec") {
        Ingest.ingestResp(spark, dir.getPath, out,
          flattenTags = Seq("host"), minPartitions = sessions, codec = codec)
      }
      println(f"SIZE $codec ${sizeOf(out) / 1e6}%8.1f MB")
    }
    println(f"SIZE lz4_raw(default) ${sizeOf("/tmp/graft_parsebench_out") / 1e6}%8.1f MB")
    spark.stop()
  }
}

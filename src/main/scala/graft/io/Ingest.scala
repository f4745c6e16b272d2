package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.SeriesKey
import graft.plan.TsStore

/** Spark entry points for batch ingestion and the persistent table layout.
  *
  * Layout contract (the Spark analogue of the reference's
  * column-per-series NB+tree, column_store.h:50-67): parquet partitioned
  * by `(metric, day bucket)` and sorted within files by `(series, ts)`.
  * That gives every query the reference's pruning for free:
  *  - metric + time range -> partition pruning (directories skipped)
  *  - value filters       -> parquet row-group min/max skipping
  *  - per-series locality -> in-file sort (merge/window ops don't shuffle
  *    already-clustered data)
  * Filterable tags are ALSO flattened to top-level columns (`tag_<k>`) so
  * `where` predicates push into the scan instead of evaluating a map
  * lookup per row (the round-1 scale gap).
  */
object Ingest {
  import org.apache.spark.sql.Encoders

  private val sampleEnc = Encoders.product[LineProtocol.ParsedSample]

  /** Whole-session file contents, one String per file, via the raw
    * Hadoop FS API ([[org.apache.spark.sql.graftio.HadoopFiles]]):
    * driver lists the files, tasks open + `readFully` + decode. The
    * `binaryFiles` input-format machinery (CombineFileInputFormat splits
    * + PortableDataStream) measured up to 17x slower for the same bytes
    * on the ingest bench; `new String(bytes, UTF_8)` keeps the JDK's
    * compact-string ASCII fast path. HDFS/S3 work unchanged through the
    * FS API. `minPartitions` defaults to the cluster parallelism — a
    * low default would funnel every session through few tasks regardless
    * of core count. */
  def sessionFiles(spark: SparkSession, path: String,
                   minPartitions: Int = 0)
      : org.apache.spark.rdd.RDD[String] = {
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    org.apache.spark.sql.graftio.HadoopFiles.wholeFiles(spark, path, mp)
  }

  /** Parse RESP session files: one file = one session (dictionary scope),
    * parallel across files. */
  def respFiles(spark: SparkSession, path: String,
                minPartitions: Int = 0): DataFrame =
    spark.createDataset(sessionFiles(spark, path, minPartitions)
      .flatMap(LineProtocol.parseRespText))(sampleEnc).toDF()

  /** RESP sessions parsed straight to the flat layout schema
    * `(metric, sname, ts, value, event, tag_<k>...)` — the ingest fast
    * path. The parser emits catalyst `UnsafeRow`s directly (via
    * [[org.apache.spark.sql.graftio.InternalRows]]): every series-level
    * string (metric, canonical sname, flattened tag values) is converted
    * to `UTF8String` ONCE per series, and each sample is written through
    * a reused `UnsafeRowWriter` + `copy()` — no `SerializeFromObject`
    * encoder stage, no Object[] + boxed ts/value per sample (the
    * GenericInternalRow variant measured 2.2x slower through the same
    * pipeline, the object-encoder one 4x). */
  def respFilesFlat(spark: SparkSession, path: String,
                    flattenTags: Seq[String] = Nil,
                    minPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val tagKeys = flattenTags.toArray
    val nTags = tagKeys.length
    val schema = StructType(
      Seq(StructField("metric", StringType), StructField("sname", StringType),
        StructField("ts", LongType), StructField("value", DoubleType),
        StructField("event", StringType)) ++
      tagKeys.map(t => StructField(s"tag_$t", StringType)))
    val rdd = sessionFiles(spark, path, minPartitions).flatMap { content =>
      // identity cache: dictionary sessions reuse one SeriesKey instance
      // per series; bounded so a dictionary-less session can't grow it
      val cache = new java.util.IdentityHashMap[SeriesKey, Array[UTF8String]]()
      val w = new UnsafeRowWriter(5 + nTags)
      LineProtocol.parseRespWith[InternalRow](content, (k, ts, v, ev) => {
        var d = cache.get(k)
        if (d == null) {
          if (cache.size > 100000) cache.clear()
          d = new Array[UTF8String](2 + nTags)
          d(0) = UTF8String.fromString(k.metric)
          d(1) = UTF8String.fromString(k.canonical)
          var i = 0
          while (i < nTags) {
            d(2 + i) = k.tags.get(tagKeys(i))
              .map(UTF8String.fromString).orNull
            i += 1
          }
          cache.put(k, d)
        }
        w.reset()
        w.zeroOutNullBytes()
        w.write(0, d(0)); w.write(1, d(1)); w.write(2, ts); w.write(3, v)
        if (ev == null) w.setNullAt(4)
        else w.write(4, UTF8String.fromString(ev))
        var i = 0
        while (i < nTags) {
          if (d(2 + i) == null) w.setNullAt(5 + i) else w.write(5 + i, d(2 + i))
          i += 1
        }
        w.getRow.copy()
      })
    }
    org.apache.spark.sql.graftio.InternalRows.toDF(spark, rdd, schema)
  }

  /** Parse OpenTSDB telnet put lines (stateless -> line-parallel). */
  def openTsdbFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).flatMap(l =>
      LineProtocol.parseOpenTsdb(l))(sampleEnc).toDF()
  }

  /** Parsed samples -> engine sample frame. */
  def toStore(parsed: DataFrame): TsStore =
    new TsStore(parsed.select(
      col("metric"), col("tags"), col("ts"),
      when(col("event").isNull, col("value")).as("value"),
      col("event")))

  val DayNs: Long = 86400L * 1000000000L

  /** Layout compression: LZ4 (raw frame) — measured both faster to
    * encode AND smaller than snappy on the sorted-run layout (the
    * reference's storage codec family too, compression.cpp LZ4 blocks).
    * zstd trades ~20% size for encode speed; pass it for cold tiers. */
  val DefaultCodec = "lz4_raw"

  /** Write the partitioned/sorted layout. `flattenTags` lifts the listed
    * tag keys into `tag_<k>` string columns for predicate pushdown. */
  def writeLayout(samples: DataFrame, path: String,
                  flattenTags: Seq[String] = Nil,
                  bucketNs: Long = DayNs,
                  saltBuckets: Int = 32,
                  codec: String = DefaultCodec): Unit = {
    val withBucket = flattenTags
      .foldLeft(samples) { (d, k) =>
        d.withColumn(s"tag_$k", try_element_at(col("tags"), lit(k)))
      }
      .withColumn("sname",
        TsStore.snameOf(col("metric"), TsStore.tagStr(col("tags"))))
    // The `tags` map is NOT stored: the canonical `sname` carries the
    // full tag set (the reference's series-id model, seriesparser.cpp:389),
    // so the shuffle payload and the parquet schema stay flat —
    // map<string,string> encoding was the most expensive part of both.
    // readLayout reconstructs the map lazily; flattened `tag_<k>` columns
    // carry the pushdown-relevant tags as real columns.
    writePrepared(withBucket.drop("tags"), path, bucketNs, saltBuckets, codec)
  }

  /** Parse RESP session files and write the layout in one pipeline — the
    * full wire-to-storage ingest path (the analogue of the reference's
    * TCP server -> NB+tree write path). Uses the flat parse
    * ([[respFilesFlat]]): sname derived in the parser, no map column ever
    * materialized. */
  def ingestResp(spark: SparkSession, inPath: String, outPath: String,
                 flattenTags: Seq[String] = Nil,
                 bucketNs: Long = DayNs,
                 saltBuckets: Int = 32,
                 codec: String = DefaultCodec,
                 minPartitions: Int = 0,
                 exchange: Boolean = false): Unit =
    writePrepared(respFilesFlat(spark, inPath, flattenTags, minPartitions),
      outPath, bucketNs, saltBuckets, codec, exchange)

  /** Shared write tail: input already carries
    * `(metric, sname, ts, value [, event, tag_*])`.
    *
    * Two modes, both ending in per-file `(sname, ts)` sorted runs:
    *
    *  - `exchange = true` (writeLayout/compactLayout default): hash
    *    partitioning on (metric, day) + a series salt: write parallelism
    *    is NOT capped at the distinct (metric, day) count — a hot
    *    metric-day splits across `saltBuckets` tasks by series hash —
    *    with no range-sampling job, and each task writes contiguous
    *    sorted series runs into its partition dirs. One file per
    *    (metric, day, salt): the fully-clustered layout.
    *
    *  - `exchange = false` (the wire-ingest path): NO shuffle — each
    *    parse task sorts ITS slice and writes one sorted run per
    *    (metric, day) it touched. Parse -> sort -> parquet fuse into a
    *    single stage; the 8M-sample exchange (serialize + spill + read
    *    back, ~25% of the write wall) disappears. This is the LSM shape
    *    and the honest analogue of the reference's ingest (per-series
    *    append, no global sort at write time, input_log.cpp): sessions
    *    arrive partitioned by connection, runs land sorted, and
    *    [[compactLayout]] (the tree-maintenance analogue) re-clusters
    *    runs into the salted layout. File count = tasks x touched
    *    partitions, bounded at scale by routing/compaction cadence, not
    *    by the writer. */
  /** Sidecar recording the layout's bucket width. Underscore-prefixed so
    * parquet directory listings skip it. The planner prunes `day=`
    * directories with `ts div bucketNs` — reading a layout with a
    * DIFFERENT width than it was written with silently drops rows, so
    * the width is persisted inside the layout (like `_ivf_centroids.txt`)
    * and [[readLayout]] picks it up by default. */
  private def bucketNsFile(path: String) = s"$path/_graft_bucket_ns"

  private[graft] def writeBucketNs(spark: SparkSession, path: String,
                                   bucketNs: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(bucketNsFile(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(bucketNs.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The persisted bucket width, or None for layouts predating the
    * sidecar (then [[DayNs]] applies, the only width that existed). */
  def readBucketNs(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(bucketNsFile(path))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
      Some(text.trim.toLong)
    }
  }

  private[io] def writePrepared(df: DataFrame, path: String, bucketNs: Long,
                                saltBuckets: Int, codec: String,
                                exchange: Boolean = true,
                                append: Boolean = false): Unit = {
    if (append) {
      // appending into an existing layout: the bucket width is part of
      // the layout's identity — a mismatched fold would scatter rows
      // into day directories the reader's pruning never visits, and
      // writeBucketNs below would then stamp the NEW width over the old
      // rows, hiding them from pruning forever
      readBucketNs(df.sparkSession, path) match {
        case Some(w) =>
          require(w == bucketNs,
            s"layout $path has bucketNs $w, fold requested $bucketNs")
        case None =>
          // no sidecar: either a fresh layout (anything goes) or a
          // legacy pre-sidecar layout whose implicit width is DayNs
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
          val hasData = fs.exists(p) &&
            fs.listStatus(p).exists(_.getPath.getName.startsWith("metric="))
          if (hasData) require(bucketNs == DayNs,
            s"layout $path predates the bucket sidecar (implicit DayNs); " +
            s"fold requested $bucketNs")
      }
    }
    val withDay =
      df.withColumn("day", expr(s"ts div ${bucketNs}L")) // exact integer div:
      // double division would round ts (> 2^53) near bucket boundaries
    val placed =
      if (exchange)
        withDay.repartition(col("metric"), col("day"),
          pmod(xxhash64(col("sname")), lit(saltBuckets)))
      else withDay
    placed
      .sortWithinPartitions(col("metric"), col("day"), col("sname"), col("ts"))
      .write
      .partitionBy("metric", "day")
      .option("compression", codec)
      // v2 data pages: DELTA_BINARY_PACKED for the sorted ts column —
      // both faster to encode and far smaller than v1's
      // dictionary-attempt-then-plain on high-cardinality longs
      .option("parquet.writer.version", "v2")
      // no dictionary pass: ~25% faster encode at IDENTICAL size on this
      // layout — sorted runs make v2's delta encodings (DELTA_BYTE_ARRAY
      // snames, DELTA_BINARY_PACKED ts) strictly better than a dict
      // attempt that gets abandoned per page; row-group min/max stats
      // (the pruning the reads rely on) don't involve the dictionary
      .option("parquet.enable.dictionary", "false")
      .mode(if (append) "append" else "overwrite")
      .parquet(path)
    // written after the parquet commit (overwrite clears the directory;
    // append just verified the width above), like writeIvf's centroids:
    // reader and writer can never disagree on the bucket width
    writeBucketNs(df.sparkSession, path, bucketNs)
  }

  /** Read the layout back as a TsStore (partition pruning on
    * metric/day happens automatically from query predicates). Pass
    * `seriesPath` (from [[writeSeries]]) to serve metadata queries from
    * the maintained dimension instead of the fact table. */
  def readLayout(spark: SparkSession, path: String,
                 seriesPath: Option[String] = None,
                 bucketNs: Long = 0L): TsStore = {
    // bucketNs <= 0 (the default) = read the layout's own persisted width
    // (falling back to DayNs for layouts predating the sidecar); an
    // explicit positive value overrides
    val width =
      if (bucketNs > 0) bucketNs
      else readBucketNs(spark, path).getOrElse(DayNs)
    val raw = spark.read.parquet(path)
    val eventCol =
      if (raw.columns.contains("event")) col("event")
      else lit(null).cast("string").as("event")
    // Tags are reconstructed from the canonical sname (exact inverse of
    // tagStr: space-separated k=v pairs, '=' split at first occurrence
    // — str_to_map splits each pair with limit 2, like SeriesKey.parse).
    // Queries that never touch `tags` (flattened-tag filters, aggregates)
    // prune the projection away entirely.
    val tagsCol =
      if (raw.columns.contains("tags")) col("tags")
      else when(instr(col("sname"), " ") > 0,
          str_to_map(expr("substring(sname, instr(sname, ' ') + 1)"),
            lit(" "), lit("=")))
        .otherwise(map().cast("map<string,string>"))
        .as("tags")
    // flattened tag_<k> columns ride along: the planner routes `where`
    // predicates to them (parquet pushdown) instead of the reconstructed
    // map; projections that don't filter on tags prune them away
    val tagCols = raw.columns.filter(_.startsWith("tag_")).toSeq.map(col)
    // the stored canonical sname rides along: consumers that need the
    // series identity (stats' distinct count) read the column instead of
    // rebuilding it from the reconstructed tags map per row. Layouts
    // written by the STREAMING sink (ParsedSample schema, pre-compaction)
    // have no sname column — derive it from the tags map, mirroring the
    // tagsCol fallback in the other direction.
    val snameCol =
      if (raw.columns.contains("sname")) col("sname")
      else TsStore.snameOf(col("metric"), TsStore.tagStr(tagsCol)).as("sname")
    val facts = raw.select(Seq(col("metric"), tagsCol, col("ts"),
      col("value"), eventCol, col(TsStore.DayCol), snameCol) ++ tagCols: _*)
    new TsStore(facts, seriesPath.map(spark.read.parquet), width)
  }

  /** Compact an existing layout in place-shape: re-reads the flat files
    * and rewrites them salted + sorted. The streaming sink
    * (`StreamIngest.writeLayoutStream`) appends one small file per
    * micro-batch per partition with no cross-file clustering — over time
    * a day directory accumulates hundreds of files and per-series scans
    * lose their in-file locality. Compaction restores the batch layout
    * contract (salt-bucketed files, `(sname, ts)` sorted runs, v2 data
    * pages) — the analogue of the reference's tree maintenance. The
    * output goes to `outPath`; swap directories (or point readers at the
    * new path) after it commits, like any immutable-layout compactor. */
  def compactLayout(spark: SparkSession, inPath: String, outPath: String,
                    flattenTags: Seq[String] = Nil,
                    bucketNs: Long = 0L,
                    saltBuckets: Int = 32,
                    codec: String = DefaultCodec): Unit = {
    // default = preserve the input layout's persisted width
    val width =
      if (bucketNs > 0) bucketNs
      else readBucketNs(spark, inPath).getOrElse(DayNs)
    val raw = spark.read.parquet(inPath).drop(TsStore.DayCol)
    // batch layouts are already flat (sname carries the tag set); the
    // streaming sink stores the tags MAP instead — compaction upgrades it
    // to the flat schema, deriving sname and the flattened tag_<k>
    // pushdown columns on the way
    val flat =
      if (raw.columns.contains("sname")) raw
      else flattenTags
        .foldLeft(raw) { (d, k) =>
          d.withColumn(s"tag_$k", try_element_at(col("tags"), lit(k)))
        }
        .withColumn("sname",
          TsStore.snameOf(col("metric"), TsStore.tagStr(col("tags"))))
        .drop("tags")
    writePrepared(flat, outPath, width, saltBuckets, codec)
  }

  /** Every `metric=…` / `day=…` partition directory of the layout:
    * (day id, path, bytes), via the Hadoop FS API so HDFS/S3 layouts
    * work unchanged. Listing cost is O(partition directories) — pure
    * namenode/metadata calls, no data read. */
  private def listDayDirs(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem,
         Seq[(Long, org.apache.hadoop.fs.Path, Long)]) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("metric="))
      .flatMap(m => fs.listStatus(m.getPath).toSeq)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .map { s =>
        val day = s.getPath.getName.stripPrefix("day=").toLong
        (day, s.getPath, fs.getContentSummary(s.getPath).getLength)
      }
    (fs, dirs)
  }

  /** Per-day byte footprint of a layout, oldest day first — the store's
    * capacity ledger (one metadata listing, no data read). Lets callers
    * pick a byte budget with known consequences ("evicting day D frees
    * B bytes") the way the reference sizes its volume ring up front. */
  def layoutDayBytes(spark: SparkSession, path: String): Seq[(Long, Long)] = {
    val (_, dayDirs) = listDayDirs(spark, path)
    dayDirs.groupBy(_._1).toSeq
      .map { case (day, ds) => (day, ds.map(_._3).sum) }
      .sortBy(_._1)
  }

  /** Size-based retention over layout + write-head spool — "keep at most
    * `maxBytes` ON DISK, whatever is oldest goes first". The spool (WAL /
    * run files awaiting a fold) is the write head: its bytes COUNT toward
    * the cap but are never deleted, mirroring the reference's volume ring
    * where the WAL and the active volume are always retained and only
    * sealed volumes recycle (libakumuli/storage_engine/blockstore.cpp,
    * functests/test_volume_overflow.py). */
  def enforceRetention(spark: SparkSession, path: String, maxBytes: Long,
                       spoolPath: String): Seq[Long] = {
    val sp = new org.apache.hadoop.fs.Path(spoolPath)
    val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
    val spoolBytes =
      if (fs.exists(sp)) fs.getContentSummary(sp).getLength else 0L
    enforceRetention(spark, path, math.max(0L, maxBytes - spoolBytes))
  }

  /** Retention enforcement — the Spark analogue of the reference's
    * fixed-volume rotation (test_database_overflow.py: when volumes
    * fill, the OLDEST data disappears and reads return a contiguous
    * recent suffix). Drops whole `day=` partition directories, oldest
    * day first across all metrics, until the layout fits `maxBytes`.
    * Day granularity mirrors volume granularity: a reader never sees a
    * torn day, and queries keep partition-pruning against the surviving
    * directories. Uses the Hadoop FS API, so HDFS/S3 layouts work
    * unchanged. Returns the dropped day ids (oldest first). */
  def enforceRetention(spark: SparkSession, path: String,
                       maxBytes: Long): Seq[Long] = {
    val (fs, dayDirs) = listDayDirs(spark, path)
    val byDay = dayDirs.groupBy(_._1).toSeq.sortBy(_._1) // oldest first
    var excess = dayDirs.map(_._3).sum - maxBytes
    val dropped = scala.collection.mutable.ArrayBuffer[Long]()
    val it = byDay.iterator
    while (excess > 0 && it.hasNext) {
      val (day, dirs) = it.next()
      // never drop the newest remaining day, however large: the
      // reference's circular volumes always retain the write head
      if (it.hasNext) {
        dirs.foreach { case (_, p, _) => fs.delete(p, true) }
        excess -= dirs.map(_._3).sum
        dropped += day
      }
    }
    dropped.toSeq
  }

  /** Time-based retention — "keep the last N days": drops every bucket
    * partition whose ENTIRE time range lies before `cutoffNs`. The
    * bucket containing the cutoff survives whole (same never-a-torn-day
    * rule as [[enforceRetention]]); with a cutoff on a bucket boundary
    * the surviving data is exactly `ts >= cutoffNs`. The bucket width
    * comes from the layout's own persisted sidecar, so non-default
    * widths evict on their own boundaries. Complements the size-based
    * variant the way the reference pairs volume count with volume size
    * (test_volume_overflow.py drives the same oldest-first reclaim).
    * Returns the dropped bucket ids (oldest first). */
  def enforceRetentionBefore(spark: SparkSession, path: String,
                             cutoffNs: Long): Seq[Long] = {
    val width = readBucketNs(spark, path).getOrElse(DayNs)
    // floorDiv: a pre-epoch cutoff must round DOWN to its bucket
    val cutoffDay = Math.floorDiv(cutoffNs, width)
    val (fs, dayDirs) = listDayDirs(spark, path)
    val doomed = dayDirs.filter(_._1 < cutoffDay).sortBy(_._1)
    doomed.foreach { case (_, p, _) => fs.delete(p, true) }
    doomed.map(_._1).distinct
  }

  /** The series dimension table `(metric, tags, tagstr)`, persisted
    * alongside the facts so suggest/search/meta queries are O(series) not
    * O(samples) (reference SeriesMatcher, seriesparser.h:74-140).
    * Distributed: dropDuplicates shuffles on the key and each reducer
    * writes its slice — no single-task bottleneck at 10^8 series. */
  def writeSeries(samples: DataFrame, path: String): Unit =
    samples
      .select(col("metric"), col("tags"),
        TsStore.tagStr(col("tags")).as("tagstr"))
      .dropDuplicates("metric", "tagstr")
      .write.mode("overwrite").parquet(path)

  /** Derive + persist the series dimension from an already-written layout:
    * reads only the (metric, sname) columns — a column-pruned scan, far
    * cheaper than re-parsing the wire input — and reconstructs the tag
    * map from the canonical sname. */
  def writeSeriesFromLayout(spark: SparkSession, layoutPath: String,
                            seriesPath: String): Unit = {
    val tagstr = when(instr(col("sname"), " ") > 0,
      expr("substring(sname, instr(sname, ' ') + 1)")).otherwise(lit(""))
    spark.read.parquet(layoutPath)
      .select(col("metric"), col("sname"))
      .dropDuplicates("sname")
      .withColumn("tagstr", tagstr)
      .select(col("metric"),
        when(length(col("tagstr")) > 0,
          str_to_map(col("tagstr"), lit(" "), lit("=")))
          .otherwise(map().cast("map<string,string>")).as("tags"),
        col("tagstr"))
      .write.mode("overwrite").parquet(seriesPath)
  }
}

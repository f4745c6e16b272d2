package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.SeriesKey
import graft.plan.TsStore

/** Delta-encoded binary run log — the ingest-side WAL analogue of the
  * reference's input log (akumulid/storage_engine/input_log.cpp: per-shard
  * LZ4-framed logs of (id, ts, value) entries with series-name frames,
  * replayed into the tree by storage maintenance). This is the fast half
  * of the reference's WAL-then-tree write architecture re-expressed for
  * Spark:
  *
  *  - [[spoolResp]] parses RESP sessions and lands the samples in
  *    per-task run files at near-parse speed — no shuffle, no sort, no
  *    columnar encode on the hot path. Each run file is self-describing
  *    (series dictionary frames interleaved with delta-encoded samples)
  *    and atomically published, the same validated-prefix contract as the
  *    wire spool.
  *  - [[readRuns]] decodes runs back to the flat layout frame (the exact
  *    [[Ingest.respFilesFlat]] schema), emitting parser-side UnsafeRows.
  *  - [[compactRuns]] re-clusters runs into the partitioned/sorted query
  *    layout — the tree-maintenance analogue, run asynchronously on
  *    whatever cadence the deployment wants (every N minutes / bytes).
  *  - [[toStore]] serves queries over not-yet-compacted runs (union it
  *    with the compacted layout's store for the live view).
  *
  * Format (all integers var-length except raw double bits):
  * `GRUN1` magic, varint tag-key count + tag keys; then frames:
  * 0x01 series: varint sid, metric, sname, per-key nullable tag values;
  * 0x02 sample: varint sid, zigzag ts-delta (per series), raw double bits;
  * 0x03 event:  varint sid, zigzag ts-delta, UTF-8 body.
  * Per-series ts deltas make timestamps ~2 bytes at typical cadences
  * (the reference's input log stores raw u64s and leans on LZ4; varint
  * deltas are smaller before compression even starts).
  */
object RunLog {

  private val Magic = Array[Byte]('G', 'R', 'U', 'N', '1')

  // ---- varint codec ------------------------------------------------------

  private[graft] def writeVarLong(out: DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.writeByte(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  private[graft] def readVarLong(in: DataInputStream): Long = {
    var shift = 0; var acc = 0L
    var b = in.readUnsignedByte()
    while ((b & 0x80) != 0) {
      acc |= (b & 0x7fL) << shift; shift += 7
      b = in.readUnsignedByte()
    }
    acc | (b.toLong << shift)
  }

  private[graft] def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[graft] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    writeVarLong(out, bs.length.toLong)
    out.write(bs)
  }

  private def readStr(in: DataInputStream): String = {
    val len = readVarLong(in).toInt
    val bs = new Array[Byte](len)
    in.readFully(bs)
    new String(bs, java.nio.charset.StandardCharsets.UTF_8)
  }

  // ---- write -------------------------------------------------------------

  /** Parse RESP session files and spool the samples into run files under
    * `outDir`, one file per task, written through the Hadoop FS API
    * (HDFS/S3/local unchanged) and atomically published (`.tmp.` prefix
    * until closed — the wire spool's validated-prefix discipline).
    * Returns the sample count. This is the timed ingest write path:
    * everything downstream (salting, sorting, columnar encode) belongs to
    * [[compactRuns]], exactly like the reference's 16.1M/s number pays
    * for the input log + in-memory tree but not for volume flushes. */
  def spoolResp(spark: SparkSession, inPath: String, outDir: String,
                flattenTags: Seq[String] = Nil,
                minPartitions: Int = 0): Long = {
    val tagKeys = flattenTags.toArray
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // Run nonce generated ONCE on the driver: every attempt of a
    // partition publishes to the SAME final name, so a task retry or
    // speculative duplicate re-publishes identical bytes instead of
    // adding a second file — a per-attempt nonce would silently
    // double-count the partition in readRuns. Distinct spoolResp calls
    // into one directory still get distinct names via the nonce.
    val runNonce = java.lang.Long.toHexString(
      System.currentTimeMillis() ^ System.nanoTime())
    val counts = Ingest.sessionFiles(spark, inPath, minPartitions)
      .mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.single(0L)
        else {
          val attempt = java.util.UUID.randomUUID().toString.take(8)
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val fs = dir.getFileSystem(sconf.value)
          val tmp = new org.apache.hadoop.fs.Path(dir,
            s".tmp.run-$runNonce-$pid-$attempt")
          val fin = new org.apache.hadoop.fs.Path(dir,
            s"run-$runNonce-$pid.grun")
          val out = new DataOutputStream(new BufferedOutputStream(
            fs.create(tmp, true), 1 << 20))
          var n = 0L
          try {
            out.write(Magic)
            writeVarLong(out, tagKeys.length.toLong)
            tagKeys.foreach(writeStr(out, _))
            // identity cache like respFilesFlat: dictionary sessions reuse
            // one SeriesKey instance per series; state = (sid, lastTs)
            val sids = new java.util.IdentityHashMap[SeriesKey, Array[Long]]()
            var nextSid = 0L
            it.foreach { content =>
              LineProtocol.parseRespWith[Unit](content, (k, ts, v, ev) => {
                var st = sids.get(k)
                if (st == null) {
                  if (sids.size > 100000) sids.clear()
                  st = Array(nextSid, 0L); nextSid += 1
                  sids.put(k, st)
                  out.writeByte(0x01)
                  writeVarLong(out, st(0))
                  writeStr(out, k.metric)
                  writeStr(out, k.canonical)
                  var i = 0
                  while (i < tagKeys.length) {
                    k.tags.get(tagKeys(i)) match {
                      case Some(tv) => out.writeByte(1); writeStr(out, tv)
                      case None     => out.writeByte(0)
                    }
                    i += 1
                  }
                }
                if (ev == null) {
                  out.writeByte(0x02)
                  writeVarLong(out, st(0))
                  writeVarLong(out, zigzag(ts - st(1)))
                  out.writeLong(java.lang.Double.doubleToRawLongBits(v))
                } else {
                  // events carry their value bits too (the parser emits
                  // NaN there): the run must be BIT-identical to the
                  // direct parse, not merely equivalent
                  out.writeByte(0x03)
                  writeVarLong(out, st(0))
                  writeVarLong(out, zigzag(ts - st(1)))
                  out.writeLong(java.lang.Double.doubleToRawLongBits(v))
                  writeStr(out, ev)
                }
                st(1) = ts
                n += 1
              }).foreach(_ => ())
            }
          } finally out.close()
          // first attempt to rename wins; a losing attempt's target was
          // already published with identical content (same partition,
          // deterministic encoding) — drop the temp and succeed
          if (!fs.rename(tmp, fin)) {
            if (!fs.exists(fin))
              throw new java.io.IOException(s"run publish failed: $tmp -> $fin")
            fs.delete(tmp, false)
          }
          Iterator.single(n)
        }
      }.sum().toLong
    counts
  }

  // ---- read --------------------------------------------------------------

  /** Decode run files back into the flat layout frame
    * `(metric, sname, ts, value, event, tag_<k>...)` — same schema and
    * UnsafeRow emission as [[Ingest.respFilesFlat]], so the result feeds
    * [[Ingest]]'s write tail or a [[TsStore]] directly. Tag keys come
    * from the file header (they were fixed at spool time). */
  def readRuns(spark: SparkSession, path: String,
               flattenTags: Seq[String] = Nil,
               minPartitions: Int = 0): DataFrame =
    readRunFiles(spark, listServableRuns(spark, path), flattenTags,
      minPartitions)

  /** Every run a READER should see: the published spool plus any runs
    * staged under `.folding/` by an in-flight (or crashed) fold — those
    * stay visible until the fold retires them, so serving never has a
    * gap while a fold's Spark job runs. The fold itself snapshots
    * [[listRuns]] (top level only): staged files belong to their own
    * fold, never to a new one. */
  def listServableRuns(spark: SparkSession, path: String): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(s"$path/.folding")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq.filter(_.isDirectory)
        .flatMap(d => fs.listStatus(d.getPath).toSeq)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".grun"))
        .map(_.getPath.toString)
    (listRuns(spark, path) ++ staged).sorted
  }

  /** Snapshot of the published run files under `path`, sorted. The
    * snapshot is the unit of the fold protocol: [[foldRuns]] compacts
    * and retires exactly one snapshot, so runs published concurrently
    * are untouched and picked up by the next cycle. */
  def listRuns(spark: SparkSession, path: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a MISSING spool directory throws (a typo'd path must not read as
    // "zero runs" — compactRuns would overwrite a layout with nothing);
    // an existing-but-empty one is a legitimate drained spool
    fs.listStatus(hp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".grun"))
      .map(_.getPath.toString).sorted
  }

  /** Decode an explicit run-file snapshot (see [[readRuns]]). */
  def readRunFiles(spark: SparkSession, runFiles: Seq[String],
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
    val mp = if (minPartitions > 0) minPartitions
             else spark.sparkContext.defaultParallelism
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val files = runFiles
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, math.min(mp, math.max(files.size, 1))))
      .flatMap[InternalRow] { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(sconf.value)
        val in = new DataInputStream(new BufferedInputStream(
          fs.open(hp), 1 << 20))
        // a downstream limit() can abandon the iterator mid-file: close
        // with the task, not only at EOF (double-close is a no-op)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        val magic = new Array[Byte](Magic.length)
        in.readFully(magic)
        require(java.util.Arrays.equals(magic, Magic), s"bad run magic: $p")
        val fileTagKeys = Array.fill(readVarLong(in).toInt)(readStr(in))
        require(fileTagKeys.sameElements(tagKeys),
          s"run $p spooled with tag keys ${fileTagKeys.mkString(",")}, " +
          s"read with ${tagKeys.mkString(",")}")
        // sid -> (interned strings, lastTs)
        val dict = new java.util.HashMap[Long, (Array[UTF8String], Array[Long])]()
        val w = new UnsafeRowWriter(5 + nTags)
        new Iterator[InternalRow] {
          private var nextRow: InternalRow = _
          private var done = false
          private def advance(): Unit = try {
            while (nextRow == null && !done) {
              val tag = in.read()
              if (tag < 0) { done = true; in.close() }
              else tag match {
                case 0x01 =>
                  val sid = readVarLong(in)
                  val d = new Array[UTF8String](2 + nTags)
                  d(0) = UTF8String.fromString(readStr(in))
                  d(1) = UTF8String.fromString(readStr(in))
                  var i = 0
                  while (i < nTags) {
                    d(2 + i) =
                      if (in.readByte() == 1) UTF8String.fromString(readStr(in))
                      else null
                    i += 1
                  }
                  dict.put(sid, (d, Array(0L)))
                case 0x02 | 0x03 =>
                  val sid = readVarLong(in)
                  val st = dict.get(sid)
                  require(st != null, s"run $p: sample before series $sid")
                  val ts = st._2(0) + unzigzag(readVarLong(in))
                  st._2(0) = ts
                  w.reset(); w.zeroOutNullBytes()
                  w.write(0, st._1(0)); w.write(1, st._1(1)); w.write(2, ts)
                  w.write(3, java.lang.Double.longBitsToDouble(in.readLong()))
                  if (tag == 0x02) w.setNullAt(4)
                  else w.write(4, UTF8String.fromString(readStr(in)))
                  var i = 0
                  while (i < nTags) {
                    if (st._1(2 + i) == null) w.setNullAt(5 + i)
                    else w.write(5 + i, st._1(2 + i))
                    i += 1
                  }
                  nextRow = w.getRow.copy()
                case other =>
                  in.close()
                  throw new IllegalStateException(s"run $p: bad frame $other")
              }
            }
          } catch {
            // publish is atomic, so a mid-frame EOF means real corruption
            // — fail loudly WITH the file path, not a bare EOFException
            case _: EOFException =>
              in.close()
              throw new IllegalStateException(
                s"corrupt run file (truncated mid-frame): $p")
          }
          def hasNext: Boolean = { advance(); nextRow != null }
          def next(): InternalRow = {
            advance()
            if (nextRow == null) throw new NoSuchElementException
            val r = nextRow; nextRow = null; r
          }
        }
      }
    org.apache.spark.sql.graftio.InternalRows.toDF(spark, rdd, schema)
  }

  /** Compact spooled runs into the partitioned/sorted query layout — the
    * tree-maintenance half of the WAL-then-tree shape. Same output as
    * [[Ingest.ingestResp]] over the original wire input. */
  def compactRuns(spark: SparkSession, runsPath: String, layoutPath: String,
                  flattenTags: Seq[String] = Nil,
                  bucketNs: Long = Ingest.DayNs,
                  saltBuckets: Int = 32,
                  codec: String = Ingest.DefaultCodec): Unit = {
    val snapshot = listRuns(spark, runsPath)
    // this is a REBUILD (overwrite): compacting an empty spool would
    // replace the target layout with nothing — refuse instead
    require(snapshot.nonEmpty,
      s"no run files under $runsPath — refusing to overwrite $layoutPath " +
      "with an empty layout (use foldRuns for incremental maintenance)")
    Ingest.writePrepared(readRunFiles(spark, snapshot, flattenTags),
      layoutPath, bucketNs, saltBuckets, codec)
  }

  /** Incremental compaction with retirement — the recurring maintenance
    * cycle of the WAL-then-tree shape, CRASH-SAFE at every step
    * (reference: test_kill.py / test_wal_recovery.py — a SIGKILL at any
    * point must cost zero samples and create zero permanent duplicates).
    *
    * Protocol (each step leaves a durable breadcrumb the next call can
    * resume from — see [[recoverFolds]]):
    *   1. atomically MOVE the snapshot into `runs/.folding/<foldId>/`
    *      (staged runs stay servable — [[listServableRuns]] — so readers
    *      never see a gap mid-fold);
    *   2. write the fold's parquet to `layout/.foldout/<foldId>` in
    *      OVERWRITE mode (re-runnable after any crash);
    *   3. record every landing target in `_folds/<foldId>.inflight`
    *      BEFORE moving anything (a retry rolls the partial landing back
    *      by exactly this list, then regenerates);
    *   4. land each file by rename under its `fold-<foldId>-` name;
    *   5. create the `_folds/<foldId>` done-marker (the commit point);
    *   6. retire: delete foldout, staging, marker.
    * A crash before 5 ⇒ recovery rolls back and redoes (the layout never
    * double-counts); after 5 ⇒ recovery just retires. The only reader-
    * visible anomaly is the historical transient one: a query executing
    * across steps 4-6 can see folded samples twice (the reference has
    * the same window when the input log recycles into the tree).
    *
    * Runs published while the fold is writing are untouched and served
    * live until the next cycle. Returns the retired files. */
  def foldRuns(spark: SparkSession, runsPath: String, layoutPath: String,
               flattenTags: Seq[String] = Nil,
               bucketNs: Long = Ingest.DayNs,
               saltBuckets: Int = 32,
               codec: String = Ingest.DefaultCodec): Seq[String] = {
    // finish any interrupted fold FIRST: its staged runs land before the
    // new snapshot, preserving fold ordering
    recoverFolds(spark, runsPath, layoutPath, flattenTags, bucketNs,
      saltBuckets, codec)
    val snapshot = listRuns(spark, runsPath)
    if (snapshot.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(runsPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // tag-key agreement with the existing layout: appended files with
      // different tag_ columns would read as all-NULL tags for every
      // folded row (no mergeSchema on the read side) — fail fast, the
      // readRuns run-header rule applied one level up
      val lp = new org.apache.hadoop.fs.Path(layoutPath)
      val layoutHasData = fs.exists(lp) &&
        fs.listStatus(lp).exists(_.getPath.getName.startsWith("metric="))
      if (layoutHasData) {
        val layoutTags = spark.read.parquet(layoutPath).columns
          .filter(_.startsWith("tag_")).map(_.stripPrefix("tag_")).toSeq
        require(layoutTags.sorted == flattenTags.sorted,
          s"layout $layoutPath has flattened tags [${layoutTags.mkString(",")}]"
          + s", fold called with [${flattenTags.mkString(",")}]")
      }
      // bucket-width agreement, checked BEFORE anything is staged or
      // written (the fold output is now generated out-of-place, so the
      // append-mode check inside writePrepared no longer guards this)
      Ingest.readBucketNs(spark, layoutPath) match {
        case Some(w) => require(w == bucketNs,
          s"layout $layoutPath has bucketNs $w, fold requested $bucketNs")
        case None => if (layoutHasData) require(bucketNs == Ingest.DayNs,
          s"layout $layoutPath predates the bucket sidecar (implicit " +
          s"DayNs); fold requested $bucketNs")
      }
      // sortable id: recovery processes crashed folds oldest-first
      val foldId = f"${System.currentTimeMillis()}%013d-" +
        java.lang.Long.toHexString(System.nanoTime())
      val staging =
        new org.apache.hadoop.fs.Path(s"$runsPath/.folding/$foldId")
      fs.mkdirs(staging)
      snapshot.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        if (!fs.rename(p,
            new org.apache.hadoop.fs.Path(staging, p.getName)) &&
            fs.exists(p))
          throw new java.io.IOException(s"failed to stage run file $f")
      }
      runFold(spark, staging, layoutPath, flattenTags, bucketNs,
        saltBuckets, codec)
    }
    snapshot
  }

  /** Resume every fold a crashed process left under `runs/.folding/`,
    * oldest first: committed folds (done-marker present) are retired,
    * uncommitted ones are rolled back by their inflight manifest and
    * redone. [[foldRuns]] calls this automatically; call it directly on
    * service start to drain crash debris before the first query. Must be
    * invoked with the same layout parameters as the original folds.
    * Returns the recovered fold ids. */
  def recoverFolds(spark: SparkSession, runsPath: String,
                   layoutPath: String,
                   flattenTags: Seq[String] = Nil,
                   bucketNs: Long = Ingest.DayNs,
                   saltBuckets: Int = 32,
                   codec: String = Ingest.DefaultCodec): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(s"$runsPath/.folding")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory)
      .sortBy(_.getPath.getName).map { d =>
        runFold(spark, d.getPath, layoutPath, flattenTags, bucketNs,
          saltBuckets, codec)
        d.getPath.getName
      }
  }

  /** Steps 2-6 of the fold protocol over one staged snapshot; safe to
    * re-run after a crash at ANY point (see [[foldRuns]]). */
  private def runFold(spark: SparkSession,
                      staging: org.apache.hadoop.fs.Path,
                      layoutPath: String, flattenTags: Seq[String],
                      bucketNs: Long, saltBuckets: Int,
                      codec: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val foldId = staging.getName
    val marker = new Path(s"$layoutPath/_folds/$foldId")
    val manifest = new Path(s"$layoutPath/_folds/$foldId.inflight")
    val outDir = new Path(s"$layoutPath/.foldout/$foldId")
    val staged = fs.listStatus(staging).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".grun"))
      .map(_.getPath.toString).sorted
    if (!fs.exists(marker) && staged.nonEmpty) {
      // roll back a previous attempt's partial landing — exactly the
      // files its manifest promised, no layout-wide scan
      if (fs.exists(manifest)) {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(manifest), java.nio.charset.StandardCharsets.UTF_8))
        try Iterator.continually(in.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty)
          .foreach(t => fs.delete(new Path(t), false))
        finally in.close()
        fs.delete(manifest, false)
      }
      // regenerate the fold output (overwrite mode — re-runnable)
      Ingest.writePrepared(readRunFiles(spark, staged, flattenTags),
        outDir.toString, bucketNs, saltBuckets, codec)
      // plan the landing and persist it BEFORE moving anything
      val moves = fs.listStatus(outDir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("metric="))
        .flatMap(m => fs.listStatus(m.getPath).toSeq)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .flatMap { d =>
          fs.listStatus(d.getPath).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith("."))
            .map { f =>
              (f.getPath, new Path(s"$layoutPath/" +
                s"${d.getPath.getParent.getName}/${d.getPath.getName}/" +
                s"fold-$foldId-${f.getPath.getName}"))
            }
        }
      val mo = fs.create(manifest, true)
      try mo.write(moves.map(_._2.toString).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally mo.close()
      // land: per-file renames under deterministic fold-scoped names
      moves.foreach { case (src, dst) =>
        fs.mkdirs(dst.getParent)
        if (!fs.rename(src, dst) && !fs.exists(dst))
          throw new java.io.IOException(
            s"failed to land fold file $src -> $dst")
      }
      // first fold into a fresh layout: stamp the width sidecar
      if (Ingest.readBucketNs(spark, layoutPath).isEmpty)
        Ingest.writeBucketNs(spark, layoutPath, bucketNs)
      fs.create(marker, true).close() // the commit point
      fs.delete(manifest, false)
    }
    // retire — after this the staged runs stop being served and the
    // transient double-visibility window closes
    fs.delete(outDir, true)
    fs.delete(staging, true)
    fs.delete(marker, false) // fold ids are never reused; stale-safe
  }

  /** The complete live view: compacted layout UNION not-yet-compacted
    * runs — the serving shape of the reference's tree + input-log pair
    * (reads see spooled data immediately; compaction later folds it into
    * the clustered layout with no visible change). The runs side derives
    * its `day` column with the LAYOUT's persisted bucket width and its
    * flattened tag columns from the layout's schema, so both legs plan
    * identically; the series dimension is derived from the union (a
    * maintained dimension would not know about spooled-only series). */
  def liveStore(spark: SparkSession, layoutPath: String,
                runsPath: String): TsStore = {
    val base = Ingest.readLayout(spark, layoutPath)
    val tagKeys = base.samples.columns.filter(_.startsWith("tag_"))
      .map(_.stripPrefix("tag_")).toSeq
    val runs = toStore(spark, runsPath, tagKeys).samples
      .withColumn(TsStore.DayCol, expr(s"ts div ${base.bucketNs}L"))
    new TsStore(base.samples.unionByName(runs), None, base.bucketNs)
  }

  /** Query view over not-yet-compacted runs: the live-serving analogue of
    * the reference's in-memory tree (data is queryable the moment the
    * spool publishes, before any compaction). Union with the compacted
    * layout's store for the full view ([[liveStore]]). */
  def toStore(spark: SparkSession, runsPath: String,
              flattenTags: Seq[String] = Nil): TsStore = {
    val raw = readRuns(spark, runsPath, flattenTags)
    val tagsCol = when(instr(col("sname"), " ") > 0,
        str_to_map(expr("substring(sname, instr(sname, ' ') + 1)"),
          lit(" "), lit("=")))
      .otherwise(map().cast("map<string,string>"))
      .as("tags")
    val tagCols = raw.columns.filter(_.startsWith("tag_")).toSeq.map(col)
    new TsStore(raw.select(Seq(col("metric"), tagsCol, col("ts"),
      col("value"), col("event"), col("sname")) ++ tagCols: _*))
  }
}

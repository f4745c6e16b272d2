package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Exactly-once landing for append-only index maintenance
  * ([[Dedup.appendLshIndex]], [[Dedup.appendSpanIndex]],
  * [[Embed.ivfUpdate]]). A bare parquet `mode("append")` is at-most-once
  * per CALL but not per BATCH: when a batch job fails after its write
  * and the orchestrator re-runs it, the same rows land a second time and
  * nothing in the layout can tell. This is the same discipline
  * [[graft.io.RunLog.spoolResp]] applies to task retries (one nonce, one
  * deterministic name per unit, replays republish instead of adding),
  * lifted to the driver-retry level: the CALLER names the batch, every
  * file the batch lands carries that name, and a replay clears the
  * batch's files before landing — so the layout's row set after N
  * replays equals the row set after one.
  *
  * Protocol per target directory:
  *   1. write the batch to `<target>/.staging-<batchId>` with
  *      mode=overwrite (self-idempotent; dot-prefixed, so parquet
  *      readers of the target never list it);
  *   2. delete every existing `batch-<batchId>-*` data file under the
  *      target — a partial previous replay, possibly with a DIFFERENT
  *      part count, is cleared wholesale rather than patched;
  *   3. rename each staged data file to
  *      `<target>/<partition dirs>/batch-<batchId>-<i>.parquet`
  *      (deterministic: staged files sorted by path), creating partition
  *      directories as needed;
  *   4. drop the staging directory.
  *
  * A crash at any step leaves a state the next replay repairs: before
  * step 3 the target is untouched or already cleared; mid-step-3 the
  * landed prefix is exactly what step 2 deletes next time. Steps 2-4
  * move metadata only — no data is rewritten. Landing is atomic per
  * FILE, not per batch: a reader racing a replay can see a partially
  * landed batch, so index maintenance and probes of the SAME layout
  * should not overlap in time (the same contract plain `append` has).
  */
private[llm] object IdempotentBatch {

  /** True for parquet data files; committer markers (`_SUCCESS`), dot
    * temporaries, and nested staging dirs are skipped. */
  private def isData(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".")
  }

  private def listDataFiles(fs: FileSystem, dir: Path): Seq[Path] = {
    if (!fs.exists(dir)) return Nil
    val out = Seq.newBuilder[Path]
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val f = it.next()
      // listFiles recurses through partition dirs; a dot-dir component
      // anywhere on the relative path (another batch's live staging)
      // must not be treated as target data
      val rel = f.getPath.toUri.getPath.stripPrefix(dir.toUri.getPath)
      if (f.isFile && isData(f.getPath) && !rel.split("/").exists(s =>
        s.startsWith(".") || s.startsWith("_")))
        out += f.getPath
    }
    out.result()
  }

  /** Land `write(stagingDir)`'s output into `target` under the batch's
    * deterministic names. `write` must produce a parquet directory
    * (optionally partitioned) with mode=overwrite at the given path. */
  def land(spark: SparkSession, target: String, batchId: String)
          (write: String => Unit): Unit = {
    require(batchId.nonEmpty && !batchId.exists(c =>
      c == '/' || c == '*' || Character.isWhitespace(c)),
      s"batchId must be a plain token, got '$batchId'")
    val conf = spark.sparkContext.hadoopConfiguration
    val tgt = new Path(target)
    val fs = tgt.getFileSystem(conf)
    val staging = new Path(tgt, s".staging-$batchId")
    write(staging.toString)
    // clear a previous (possibly partial) landing of this batch. Match
    // the landed name EXACTLY (batch-<id>-<numeric index>.parquet): a
    // prefix test would also delete batch "b1-retry"'s files when
    // replaying batch "b1", since batchId may itself contain '-'
    // (e.g. "snap-2026-08-15").
    val landedName =
      java.util.regex.Pattern.compile(
        "^batch-" + java.util.regex.Pattern.quote(batchId) +
          "-\\d+\\.parquet$")
    listDataFiles(fs, tgt)
      .filter(p => landedName.matcher(p.getName).matches())
      .foreach(p => fs.delete(p, false))
    // land staged files under deterministic names, preserving the
    // partition directory layout (e.g. ivf_cell=3/...)
    val stagingPrefix = staging.toUri.getPath
    listDataFiles(fs, staging).sortBy(_.toString).zipWithIndex.foreach {
      case (src, i) =>
        val rel = src.toUri.getPath.stripPrefix(stagingPrefix)
          .stripPrefix("/")
        val parent = rel.lastIndexOf('/') match {
          case -1 => tgt
          case k  => new Path(tgt, rel.substring(0, k))
        }
        fs.mkdirs(parent)
        val dst = new Path(parent, s"batch-$batchId-$i.parquet")
        if (!fs.rename(src, dst) && !fs.exists(dst))
          throw new java.io.IOException(s"batch land failed: $src -> $dst")
    }
    fs.delete(staging, true)
  }
}

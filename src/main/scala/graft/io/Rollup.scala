package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plan.TsStore

/** Multi-resolution rollup store — materialized continuous aggregates
  * (the "1m/1h/1d rollup tables" every production TSDB deployment keeps;
  * the reference can only re-scan raw samples for every aggregate
  * query, `group-aggregate` has no materialization path).
  *
  * Each rollup step stores, per (metric, series, bucket), the FULL
  * mergeable summary for SURVEY §2.6's aggregate set: count, sum,
  * min, max, and argmin/argmax-by-time (first/last with the
  * (ts, value)-struct tie-break every downsampler here uses). All six
  * re-aggregate associatively, so a query at ANY step that is a
  * multiple of a stored step is served from the stored rollup with one
  * summary-scale aggregate — never a raw scan. mean/avg derives as
  * sum/count at serve time (it does not merge; the parts do).
  *
  * Layout: `path/step=<ns>/` parquet per step (coarser steps are built
  * from the raw frame too — at 100 TB build them from the next-finer
  * rollup instead; the merge algebra above is exactly what makes that
  * legal). Serving picks the COARSEST stored step dividing the query
  * step: fewest rows read, and dir-scoped reads never touch other
  * resolutions.
  */
object Rollup {

  private def stepDir(path: String, stepNs: Long) = s"$path/step=$stepNs"

  /** Per-step summary of a sample batch (the mergeable form). */
  private def stepAgg(samples: DataFrame, step: Long): DataFrame = {
    val base = samples
      .filter(col("value").isNotNull)
      .select(col("metric"),
        TsStore.snameOf(col("metric"), TsStore.tagStr(col("tags")))
          .as("sname"),
        col("ts").cast("long").as("ts"),
        col("value").cast("double").as("value"))
    base
      .groupBy(col("metric"), col("sname"),
        (expr(s"ts div ${step}L") * step).as("bucket"))
      .agg(count(col("value")).as("cnt"),
        sum(col("value")).as("vsum"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"),
        min(struct(col("ts").as("t"), col("value").as("v"))).as("__f"),
        max(struct(col("ts").as("t"), col("value").as("v"))).as("__l"))
      .select(col("metric"), col("sname"), col("bucket"), col("cnt"),
        col("vsum"), col("vmin"), col("vmax"),
        col("__f.t").as("first_ts"), col("__f.v").as("first_v"),
        col("__l.t").as("last_ts"), col("__l.v").as("last_v"))
  }

  /** Merge summary rows sharing a (metric, sname, bucket) key — the
    * associative algebra every serve/update path reuses. */
  private def mergeSummaries(df: DataFrame): DataFrame =
    df.groupBy(col("metric"), col("sname"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"),
        min(struct(col("first_ts").as("t"), col("first_v").as("v")))
          .as("__f"),
        max(struct(col("last_ts").as("t"), col("last_v").as("v")))
          .as("__l"))
      .select(col("metric"), col("sname"), col("bucket"), col("cnt"),
        col("vsum"), col("vmin"), col("vmax"),
        col("__f.t").as("first_ts"), col("__f.v").as("first_v"),
        col("__l.t").as("last_ts"), col("__l.v").as("last_v"))

  /** Build and write rollups at each step. Input: the engine sample
    * frame (metric, tags, ts, value). */
  def write(samples: DataFrame, path: String, steps: Seq[Long]): Unit = {
    require(steps.nonEmpty && steps.forall(_ > 0), "steps must be positive")
    steps.foreach { step =>
      stepAgg(samples, step)
        .write.mode("overwrite").parquet(stepDir(path, step))
    }
  }

  /** Incrementally fold a NEW sample batch into every stored rollup —
    * the maintenance path a continuous ingest runs per batch: summarize
    * the batch at each stored step, merge with the stored summaries
    * (the mergeable algebra makes this EXACT, not approximate — the
    * result is bit-for-bit what a full rebuild over old+new would
    * produce, up to fp addition order in `vsum`), land out-of-place,
    * swap by rename. Cost is batch-scale + touched-summary-scale; the
    * raw history is never rescanned. */
  def update(samples: DataFrame, path: String): Unit = {
    val spark = samples.sparkSession
    val steps = storedSteps(spark, path)
    require(steps.nonEmpty, s"no rollup store at $path")
    val hconf = spark.sparkContext.hadoopConfiguration
    steps.foreach { step =>
      val dir = stepDir(path, step)
      val tmp = s"$dir.updating"
      val merged = mergeSummaries(
        spark.read.parquet(dir).unionByName(stepAgg(samples, step)))
      merged.write.mode("overwrite").parquet(tmp)
      // Swap via rename-aside, not delete-then-rename: a crash between a
      // delete and the rename-in would lose the whole step. Sequence:
      // dir -> dir.old (atomic), tmp -> dir (atomic), delete dir.old.
      // A crash leaves the old dir live (tmp orphaned), the new dir live
      // (dir.old orphaned), or — in the window BETWEEN the two renames —
      // only dir.old; storedSteps restores that last case by renaming
      // dir.old back before any read or update (see its scaladoc), and
      // ignores the .updating/.old names otherwise, so no crash point
      // loses the step or poisons reads.
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      val dirP = new org.apache.hadoop.fs.Path(dir)
      val oldP = new org.apache.hadoop.fs.Path(s"$dir.old")
      fs.delete(oldP, true) // clear any orphan from a prior crash
      require(fs.rename(dirP, oldP), s"rename-aside failed for $dir")
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dirP),
        s"rename failed for $dir")
      fs.delete(oldP, true)
    }
  }

  /** Stored steps, from the `step=<ns>` directory names. Self-healing:
    * a crash in [[update]]'s two-rename swap window (after
    * `dir -> dir.old`, before `tmp -> dir`) leaves NO live `step=` dir —
    * only the rename-aside orphan. Every listing first restores such
    * orphans (`step=X.old` without `step=X` renames back; the
    * `.updating` merge output is deleted — update() is atomic, the
    * caller never got a return so it must replay the batch, and
    * promoting the merged dir instead would double-count that replay).
    * So the swap window is repaired on the next read or update, never
    * by hand. */
  def storedSteps(spark: SparkSession, path: String): Seq[Long] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) return Seq.empty
    def names() = fs.listStatus(hp).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
    val all = names()
    val live = all.toSet
    all.filter(n => n.startsWith("step=") && n.endsWith(".old")).foreach { o =>
      val base = o.dropRight(4)
      if (!live(base)) {
        fs.delete(new org.apache.hadoop.fs.Path(hp, s"$base.updating"), true)
        require(fs.rename(new org.apache.hadoop.fs.Path(hp, o),
          new org.apache.hadoop.fs.Path(hp, base)),
          s"crash repair: restoring $o -> $base failed")
      }
    }
    (if (all.exists(o => o.endsWith(".old") &&
        !live(o.dropRight(4)))) names() else all)
      // strict name parse: a stale `step=<ns>.updating` / `.old` dir from
      // an interrupted update must not brick the store with a
      // NumberFormatException — only pure-long step names count
      .collect { case n if n.startsWith("step=") &&
          n.drop(5).forall(_.isDigit) && n.length > 5 => n.drop(5).toLong }
      .sorted
  }

  /** Serve a group-aggregate at `stepNs` from the coarsest stored
    * rollup whose step divides it — one summary-scale merge aggregate,
    * no raw-sample scan. Output: metric, sname, bucket, cnt, vsum,
    * vmin, vmax, mean (rounded 6), first_v, last_v. */
  def serve(spark: SparkSession, path: String, stepNs: Long): DataFrame = {
    val usable = storedSteps(spark, path).filter(s => stepNs % s == 0)
    require(usable.nonEmpty,
      s"no stored rollup step divides ${stepNs}ns " +
        s"(stored: ${storedSteps(spark, path).mkString(",")})")
    val best = usable.max
    spark.read.parquet(stepDir(path, best))
      .groupBy(col("metric"), col("sname"),
        (expr(s"bucket div ${stepNs}L") * stepNs).as("bucket"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("vsum")).as("vsum"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"),
        min(struct(col("first_ts").as("t"), col("first_v").as("v")))
          .as("__f"),
        max(struct(col("last_ts").as("t"), col("last_v").as("v")))
          .as("__l"))
      .select(col("metric"), col("sname"), col("bucket"), col("cnt"),
        round(col("vsum"), 6).as("vsum"), col("vmin"), col("vmax"),
        round(col("vsum") / col("cnt"), 6).as("mean"),
        col("__f.v").as("first_v"), col("__l.v").as("last_v"))
  }
}

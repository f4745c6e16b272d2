package graft.plan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-relational operators the reference engine lacks but that users of
  * a time-series store routinely need next to it: as-of join, bounded
  * range join, and gap-based sessionization. The reference's only join is
  * exact-timestamp alignment (reference: libakumuli/storage_engine/
  * operators/join.cpp — series merged on identical ts); these close the
  * gap Spark-first.
  *
  * Scale notes (the whole point of each shape):
  *  - `asOf` is union + keyed window — ONE shuffle on the join key, no
  *    range explosion. A naive `l.ts >= r.ts` theta join is O(n·m) per
  *    key and unrunnable at 100 TB. Skew note: a hot key's full history
  *    lands in one task (window partitionBy) — acceptable for keyed event
  *    streams; for a single giant key pre-split by time and stitch.
  *  - `rangeJoin` bucketizes time by the window width so each left row
  *    meets only the buckets its window can touch — an equi-join with a
  *    residual band filter, never a cross product.
  *  - `sessionize` is a single keyed window (lag + running sum).
  */
object EventOps {

  /** As-of join: for every left row, the single most recent right row with
    * `right.ts <= left.ts` on the same key (optionally within
    * `toleranceNs`). Right rows are first collapsed to one value per
    * (key, ts) via `max` so exact-ts duplicates are deterministic; a
    * null-valued right row (all values at its (key, ts) null) IS carried —
    * it is the latest observation, so the output pairs its timestamp with
    * a null value rather than resurrecting an older value.
    *
    * Output: all left columns, plus `<valueCol><suffix>` (the carried
    * right value) and `<tsCol><suffix>` (the right timestamp it came
    * from); both null when no right row qualifies.
    */
  def asOf(left: DataFrame, right: DataFrame, on: Seq[String],
           tsCol: String, valueCol: String, suffix: String = "_r",
           toleranceNs: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "asOf requires at least one key column")
    val vOut  = valueCol + suffix
    val tsOut = tsCol + suffix
    val leftCols = left.columns.toSeq
    val reserved = Seq(vOut, tsOut, "__side", "__r")
    require(reserved.forall(c => !leftCols.contains(c)),
      s"left columns collide with ${reserved.filter(leftCols.contains)}")

    val r1 = right.groupBy((on :+ tsCol).map(col): _*)
      .agg(max(col(valueCol)).as(vOut))
    // Union frame: right rows carry (vOut, tsOut) and sort BEFORE left
    // rows at the same timestamp (side 0 < 1) so an exact-ts right row
    // is visible to the left row — the `<=` contract.
    val lPart = left.select(
      (leftCols.map(col) ++ Seq(
        lit(null).cast(r1.schema(vOut).dataType).as(vOut),
        lit(null).cast("long").as(tsOut),
        lit(1).as("__side"))): _*)
    val rPart = r1.select(
      (leftCols.map(c =>
        if (on.contains(c) || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(vOut),
        col(tsCol).cast("long").as(tsOut),
        lit(0).as("__side"))): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct carried per right row — value and timestamp always come
    // from the same row (two independent last() windows would pair an
    // older non-null value with a newer null-valued row's timestamp, and
    // then evaluate tolerance against the wrong timestamp). The when() is
    // null on left rows, a non-null struct on every right row (even a
    // null-valued one), so last(ignoreNulls) tracks right rows exactly.
    val carried = lPart.unionByName(rPart)
      .withColumn("__r", last(
        when(col("__side") === 0,
          struct(col(tsOut).as("ts"), col(vOut).as("v"))),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = toleranceNs match {
      case Some(t) => col(tsCol).cast("long") - col("__r.ts") <= t
      case None    => col("__r").isNotNull
    }
    carried.select(
      (leftCols.map(col) ++ Seq(
        when(inTol, col("__r.v")).as(vOut),
        when(inTol, col("__r.ts")).as(tsOut))): _*)
  }

  /** Bounded range join: all (left, right) pairs on the same key with
    * `right.ts` in `[left.ts + lowerNs, left.ts + upperNs]`. Both sides'
    * rows land in `ts div width` buckets (width = window length), a left
    * row is exploded into the at-most-two buckets its window can touch,
    * and the equi-join on (key, bucket) carries a residual band filter —
    * never an unbounded theta join. Bucketing uses integer `div` on both
    * sides (long ns exceed 2^53, double floor() can misbucket edge rows);
    * only monotonicity + identical rounding on both sides matter, so
    * truncation-toward-zero is fine.
    *
    * Output: all left columns, plus `<tsCol><suffix>` and every
    * `rightCols` entry suffixed.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                tsCol: String, lowerNs: Long, upperNs: Long,
                rightCols: Seq[String], suffix: String = "_r"): DataFrame = {
    require(on.nonEmpty, "rangeJoin requires at least one key column")
    require(upperNs >= lowerNs, "upperNs must be >= lowerNs")
    require(!rightCols.contains(tsCol),
      s"rightCols must not contain '$tsCol' (its suffixed copy is emitted already)")
    val width = math.max(upperNs - lowerNs, 1L)
    val rOut = rightCols.map(_ + suffix)
    val outCols = rOut :+ (tsCol + suffix)
    val reserved = outCols ++ Seq("__rts", "__lts", "__b")
    require(reserved.forall(c => !left.columns.contains(c)),
      s"left columns collide with ${reserved.filter(left.columns.contains)}")

    val r1 = right.select(
      (on.map(col) ++ Seq(col(tsCol).cast("long").as("__rts")) ++
        rightCols.zip(rOut).map { case (c, o) => col(c).as(o) }): _*)
      .withColumn("__b", expr(s"__rts div ${width}L"))
    val l1 = left
      .withColumn("__lts", col(tsCol).cast("long"))
      .withColumn("__b", explode(expr(
        s"sequence((__lts + ${lowerNs}L) div ${width}L, " +
        s"(__lts + ${upperNs}L) div ${width}L)")))
    l1.join(r1, on :+ "__b")
      .filter(col("__rts").between(col("__lts") + lowerNs,
                                   col("__lts") + upperNs))
      .select((left.columns.toSeq.map(col) ++
        Seq(col("__rts").as(tsCol + suffix)) ++ rOut.map(col)): _*)
  }

  /** Gap-based sessionization: a new session starts at a row whose gap to
    * the key's previous row exceeds `gapNs`. Adds `session_id`
    * (`<key vals joined with '/'>#<index>`) — one keyed window, one
    * shuffle. */
  def sessionize(df: DataFrame, on: Seq[String], tsCol: String,
                 gapNs: Long): DataFrame = {
    require(on.nonEmpty, "sessionize requires at least one key column")
    require(gapNs > 0, "gapNs must be positive")
    val w = Window.partitionBy(on.map(col): _*).orderBy(col(tsCol).asc)
    val newSess = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long")
          > gapNs, 1L).otherwise(0L)
    df.withColumn("__new", newSess)
      .withColumn("session_id",
        concat(concat_ws("/", on.map(c => col(c).cast("string")): _*),
          lit("#"),
          sum(col("__new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("string")))
      .drop("__new")
  }

  /** Per-session stats over a sessionized frame: start/end ns, row count,
    * value sum — the usual downstream of `sessionize`. */
  def sessionStats(sessioned: DataFrame, on: Seq[String], tsCol: String,
                   valueCol: String): DataFrame =
    sessioned.groupBy((on :+ "session_id").map(col): _*)
      .agg(
        min(col(tsCol)).cast("long").as("session_start"),
        max(col(tsCol)).cast("long").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"))
}

package graft.plan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-relational operators the reference engine lacks but that users of
  * a time-series store routinely need next to it: as-of join, bounded
  * range join, and gap-based sessionization. The reference's only join is
  * exact-timestamp alignment (reference: libakumuli/query_processing/
  * join.cpp:1-109); these close the gap Spark-first.
  *
  * Scale notes (the whole point of each shape):
  *  - `asOf` is union + keyed window — ONE shuffle on the join key, no
  *    range explosion. A naive `l.ts >= r.ts` theta join is O(n·m) per
  *    key and unrunnable at 100 TB.
  *  - `rangeJoin` bucketizes time by the window width so each left row
  *    meets only its own and one neighbouring bucket — an equi-join with
  *    a residual filter, never a cross product.
  *  - `sessionize` is a single keyed window (lag + running sum).
  */
object EventOps {

  /** As-of join: for every left row, the single most recent right row with
    * `right.ts <= left.ts` on the same key (optionally within
    * `toleranceNs`). Right rows are first collapsed to one value per
    * (key, ts) via `max` so ties are deterministic.
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
    require(!leftCols.contains(vOut) && !leftCols.contains(tsOut),
      s"suffix '$suffix' collides with a left column")

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
    val carried = lPart.unionByName(rPart)
      .withColumn("__v",  last(col(vOut), ignoreNulls = true).over(w))
      .withColumn("__ts", last(col(tsOut), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = toleranceNs match {
      case Some(t) => col(tsCol).cast("long") - col("__ts") <= t
      case None    => lit(true)
    }
    carried.select(
      (leftCols.map(col) ++ Seq(
        when(inTol, col("__v")).as(vOut),
        when(inTol, col("__ts")).as(tsOut))): _*)
  }

  /** Bounded range join: all (left, right) pairs on the same key with
    * `right.ts` in `[left.ts + lowerNs, left.ts + upperNs]`. Both sides'
    * rows land in `floor(ts / width)` buckets (width = window length), a
    * left row is exploded into the at-most-two buckets its window can
    * touch, and the equi-join on (key, bucket) carries a residual
    * band filter — never an unbounded theta join.
    *
    * Output: all left columns, plus every `rightCols` entry suffixed.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                tsCol: String, lowerNs: Long, upperNs: Long,
                rightCols: Seq[String], suffix: String = "_r"): DataFrame = {
    require(on.nonEmpty, "rangeJoin requires at least one key column")
    require(upperNs >= lowerNs, "upperNs must be >= lowerNs")
    val width = math.max(upperNs - lowerNs, 1L)
    val rOut = rightCols.map(_ + suffix)
    require(rOut.forall(c => !left.columns.contains(c)),
      s"suffix '$suffix' collides with a left column")

    val r1 = right.select(
      (on.map(col) ++ Seq(col(tsCol).cast("long").as("__rts")) ++
        rightCols.zip(rOut).map { case (c, o) => col(c).as(o) }): _*)
      .withColumn("__b", floor(col("__rts") / width))
    val l1 = left
      .withColumn("__lts", col(tsCol).cast("long"))
      .withColumn("__b", explode(sequence(
        floor((col("__lts") + lowerNs) / width),
        floor((col("__lts") + upperNs) / width))))
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

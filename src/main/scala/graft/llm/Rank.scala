package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Exact in-group ranking WITHOUT a per-group single-task sort.
  *
  * `Window.partitionBy(group).orderBy(keys)` over a low-cardinality group
  * column (source, language, split) funnels each group through ONE task —
  * at 100 TB a handful of sources means a handful of executors sorting
  * ~corpus/n_sources rows each while the rest of the cluster idles (the
  * r13 verdict's named scale-killer in `doc_ccnet_bucket`). The scalable
  * equivalent is the global-sort pattern Spark itself uses for `orderBy`:
  *
  *   1. range-repartition on (group ++ orderKeys) — every shuffle
  *      partition holds a contiguous key range, a big group SPANS MANY
  *      partitions;
  *   2. count rows per (partition, group) and collect — at most
  *      `shuffle.partitions × n_groups` rows, model-scale by the
  *      low-cardinality premise;
  *   3. prefix-sum those counts on the driver into per-(partition, group)
  *      exclusive offsets + per-group totals, broadcast them back;
  *   4. rank = offset + row_number over (partition, group) — a window
  *      whose partitions are bounded by ONE SHUFFLE PARTITION, never by
  *      group size.
  *
  * Steps 2 and 4 must see the same partition ids, so the ranged frame is
  * `localCheckpoint`ed (also cuts the upstream lineage — the scoring
  * pass above this is not recomputed for the count job; the per-doc
  * narrow frame is exactly the shape the lineage-cut A/Bs favor).
  *
  * Ties across orderKeys land in one partition (RangePartitioner assigns
  * by key value), so ranks are exact as long as (group ++ orderKeys) has
  * no full-tuple duplicates — pass a unique id as the last key, same as
  * any deterministic window ordering.
  */
object Rank {

  /** Adds `rankCol` (1-based exact rank within `groupCols`, ordered by
    * `orderKeys`) and `nCol` (group size) to `df`. Group columns must be
    * non-null (they are join keys for the broadcast offsets). */
  def groupRank(df: DataFrame, groupCols: Seq[String], orderKeys: Seq[Column],
                rankCol: String, nCol: String): DataFrame = {
    val spark = df.sparkSession
    val rangeKeys = groupCols.map(col) ++ orderKeys
    val ranged = df.repartitionByRange(rangeKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val gcols = ("__pid" +: groupCols).map(col)
    val counts = ranged.groupBy(gcols: _*).agg(count(lit(1)).as("__c"))
      .collect()
    // driver-side prefix sum: offsets per (pid, group), totals per group
    val grouped = counts.groupBy(r => r.toSeq.slice(1, 1 + groupCols.size))
    val offRows = grouped.iterator.flatMap { case (gkey, rows) =>
      val byPid = rows.sortBy(_.getInt(0))
      val total = byPid.map(_.getLong(1 + groupCols.size)).sum
      var acc = 0L
      byPid.map { r =>
        val off = acc
        acc += r.getLong(1 + groupCols.size)
        Row.fromSeq(Seq(r.getInt(0)) ++ gkey ++ Seq(off, total))
      }
    }.toSeq
    val gFields = groupCols.map(n => df.schema(n))
    val offSchema = StructType(
      StructField("__pid", IntegerType, nullable = false) +:
        gFields :+
        StructField("__off", LongType, nullable = false) :+
        StructField("__grpN", LongType, nullable = false))
    val offs = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val w = Window.partitionBy(gcols: _*).orderBy(orderKeys: _*)
    ranged
      .join(broadcast(offs), "__pid" +: groupCols)
      .withColumn(rankCol, row_number().over(w).cast("long") + col("__off"))
      .withColumnRenamed("__grpN", nCol)
      .drop("__pid", "__off")
  }

  /** Staged exact per-group top-`n`: identical output to
    * `row_number().over(partitionBy(groupCols).orderBy(orderKeys))
    * <= nExpr`, without ever sorting a whole group in one task.
    *
    * Phase 1 pre-prunes per (group, salt): a row whose rank within its
    * salt slice exceeds the group's `n` cannot be in the group's global
    * top-n (the global top-n rows intersected with one salt slice are at
    * most n rows, each ranking no worse there than globally), so
    * survivors are ≤ salts·n per group. Phase 2 ranks the survivors
    * exactly — its window partitions are bounded by salts·n rows,
    * CORPUS-INDEPENDENT, so a hot group (one giant domain, one dominant
    * source) never funnels its raw rows through a single task; the only
    * full-corpus shuffle is phase 1's, keyed on (group, salt), which a
    * hot group spreads over `salts` tasks.
    *
    * `nExpr` must be a deterministic per-group bound (a literal cap, a
    * map lookup on the group value); `saltKey` any column that varies
    * within a group (the tie-break id). `rankCol`, when set, carries the
    * exact global in-group rank of each survivor. */
  def stagedTopN(df: DataFrame, groupCols: Seq[Column],
                 orderKeys: Seq[Column], nExpr: Column, saltKey: Column,
                 rankCol: Option[String] = None,
                 salts: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(salts >= 1, "salts must be >= 1")
    val salt = pmod(xxhash64(saltKey), lit(salts.toLong))
    val w1 = Window.partitionBy(groupCols :+ salt: _*).orderBy(orderKeys: _*)
    val pruned = df
      .withColumn("__sr", row_number().over(w1).cast("long"))
      .filter(col("__sr") <= nExpr.cast("long"))
      .drop("__sr")
    val w2 = Window.partitionBy(groupCols: _*).orderBy(orderKeys: _*)
    val ranked = pruned
      .withColumn(rankCol.getOrElse("__gr"), row_number().over(w2).cast("long"))
      .filter(col(rankCol.getOrElse("__gr")) <= nExpr.cast("long"))
    if (rankCol.isDefined) ranked else ranked.drop("__gr")
  }

  /** SQL-standard `ntile(n)` from the closed form over (rank, N): the
    * first `N mod n` buckets take `N div n + 1` rows, the rest
    * `N div n` — identical output to
    * `ntile(n).over(partitionBy(group).orderBy(keys))`, computed from
    * [[groupRank]]'s scalable rank instead of a whole-group window. */
  def ntileBucket(df: DataFrame, groupCols: Seq[String],
                  orderKeys: Seq[Column], n: Int,
                  bucketCol: String): DataFrame = {
    require(n >= 1, "ntile bucket count must be >= 1")
    val ranked = groupRank(df, groupCols, orderKeys, "__r", "__N")
    ranked
      .withColumn(bucketCol, expr(
        s"""CAST(CASE WHEN __r <= ((__N DIV $n) + 1) * (__N % $n)
           |  THEN (__r - 1) DIV ((__N DIV $n) + 1) + 1
           |  ELSE (__N % $n)
           |    + (__r - ((__N DIV $n) + 1) * (__N % $n) - 1) DIV (__N DIV $n)
           |    + 1 END AS INT)""".stripMargin))
      .drop("__r", "__N")
  }
}

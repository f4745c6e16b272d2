package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Parse RESP session files: one file = one session (dictionary scope),
    * parallel across files. */
  def respFiles(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.wholeTextFiles(path)
    spark.createDataset(files.flatMap { case (_, content) =>
      LineProtocol.parseResp(content.linesIterator)
    })(sampleEnc).toDF()
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

  /** Write the partitioned/sorted layout. `flattenTags` lifts the listed
    * tag keys into `tag_<k>` string columns for predicate pushdown. */
  def writeLayout(samples: DataFrame, path: String,
                  flattenTags: Seq[String] = Nil,
                  bucketNs: Long = DayNs): Unit = {
    val withBucket = flattenTags
      .foldLeft(samples) { (d, k) =>
        d.withColumn(s"tag_$k", try_element_at(col("tags"), lit(k)))
      }
      .withColumn("day", expr(s"ts div ${bucketNs}L")) // exact integer div:
      // double division would round ts (> 2^53) near bucket boundaries
      .withColumn("sname",
        TsStore.snameOf(col("metric"), TsStore.tagStr(col("tags"))))
    // Hash partitioning on (metric, day) + a series salt: write
    // parallelism is NOT capped at the distinct (metric, day) count — a
    // hot metric-day splits across `saltBuckets` tasks by series hash —
    // with no range-sampling job, and each task still writes contiguous
    // sorted series runs into its partition dirs.
    val saltBuckets = 8
    withBucket
      .repartition(col("metric"), col("day"),
        pmod(xxhash64(col("sname")), lit(saltBuckets)))
      .sortWithinPartitions(col("metric"), col("day"), col("sname"), col("ts"))
      .write
      .partitionBy("metric", "day")
      .mode("overwrite")
      .parquet(path)
  }

  /** Read the layout back as a TsStore (partition pruning on
    * metric/day happens automatically from query predicates). Pass
    * `seriesPath` (from [[writeSeries]]) to serve metadata queries from
    * the maintained dimension instead of the fact table. */
  def readLayout(spark: SparkSession, path: String,
                 seriesPath: Option[String] = None): TsStore = {
    val raw = spark.read.parquet(path)
    val eventCol =
      if (raw.columns.contains("event")) col("event")
      else lit(null).cast("string").as("event")
    val facts = raw.select(col("metric"), col("tags"), col("ts"),
      col("value"), eventCol, col(TsStore.DayCol))
    seriesPath match {
      case Some(p) => new TsStore(facts, Some(spark.read.parquet(p)))
      case None    => new TsStore(facts)
    }
  }

  /** The series dimension table, persisted alongside the facts so
    * suggest/search/meta queries are O(series) not O(samples)
    * (reference SeriesMatcher, seriesparser.h:74-140). */
  def writeSeries(samples: DataFrame, path: String): Unit =
    samples
      .select(col("metric"), col("tags"),
        TsStore.tagStr(col("tags")).as("tagstr"))
      .dropDuplicates("metric", "tagstr")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
}

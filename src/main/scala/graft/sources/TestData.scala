package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plan.TsStore

/** Adapters mapping the driver-generated parquet tables
  * (`/root/testdata/sf{N}`, see TESTDATA.md) into the engine's sample
  * frame. The `events` table plays the role of the reference's ingested
  * series: `metric := event_type`, tags derived from `user_id` and the
  * `props` JSON, `ts` as ns since epoch, `value` as the sample.
  */
object TestData {

  /** The events table stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects by default; `nanosAsLong` surfaces it
    * as a ns LongType — exactly the engine's native timestamp unit (ns u64,
    * reference: include/akumuli_def.h:36). The adapter then truncates to µs
    * resolution (`(ts div 1000) * 1000`) because the DuckDB oracle reads the
    * same parquet at µs precision; the engine itself is ns-clean. */
  private def readEvents(spark: SparkSession, sfDir: String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Metric-series store over `events.parquet`. Tags:
    * `user` = user_id, `k` = json props.k mod 10 (a second, coarser tag so
    * group/pivot-by-tag queries are non-trivial). */
  def events(spark: SparkSession, sfDir: String): TsStore = {
    val raw = readEvents(spark, sfDir)
    new TsStore(raw.select(
      col("event_type").as(TsStore.Metric),
      map(
        lit("user"), col("user_id").cast("string"),
        lit("k"), (get_json_object(col("props"), "$.k").cast("int") % 10)
          .cast("string")
      ).as(TsStore.Tags),
      expr("(ts div 1000) * 1000").cast("long").as(TsStore.Ts),
      col("value").as(TsStore.Value)))
  }

  /** Event-series store (string payloads): `!event_type` series whose body
    * is the raw `props` JSON — the analogue of the reference's `!`-prefixed
    * event series (reference: queryparser.cpp:308-336). */
  def eventStore(spark: SparkSession, sfDir: String): TsStore = {
    val raw = readEvents(spark, sfDir)
    new TsStore(raw.select(
      concat(lit("!"), col("event_type")).as(TsStore.Metric),
      map(lit("user"), col("user_id").cast("string")).as(TsStore.Tags),
      expr("(ts div 1000) * 1000").cast("long").as(TsStore.Ts),
      lit(null).cast("double").as(TsStore.Value),
      col("props").as(TsStore.Event)))
  }

  def table(spark: SparkSession, sfDir: String, name: String) =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

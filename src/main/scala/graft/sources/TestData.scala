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

  /** Metric-series store over `events.parquet`. Tags:
    * `user` = user_id, `k` = json props.k mod 10 (a second, coarser tag so
    * group/pivot-by-tag queries are non-trivial). */
  def events(spark: SparkSession, sfDir: String): TsStore = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    new TsStore(raw.select(
      col("event_type").as(TsStore.Metric),
      map(
        lit("user"), col("user_id").cast("string"),
        lit("k"), (get_json_object(col("props"), "$.k").cast("int") % 10)
          .cast("string")
      ).as(TsStore.Tags),
      (unix_micros(col("ts")) * 1000).as(TsStore.Ts),
      col("value").as(TsStore.Value)))
  }

  /** Event-series store (string payloads): `!event_type` series whose body
    * is the raw `props` JSON — the analogue of the reference's `!`-prefixed
    * event series (reference: queryparser.cpp:308-336). */
  def eventStore(spark: SparkSession, sfDir: String): TsStore = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    new TsStore(raw.select(
      concat(lit("!"), col("event_type")).as(TsStore.Metric),
      map(lit("user"), col("user_id").cast("string")).as(TsStore.Tags),
      (unix_micros(col("ts")) * 1000).as(TsStore.Ts),
      lit(null).cast("double").as(TsStore.Value),
      col("props").as(TsStore.Event)))
  }

  def table(spark: SparkSession, sfDir: String, name: String) =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

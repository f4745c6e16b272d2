package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row

import graft.io.LineProtocol
import graft.plan.TsStore

/** Structured Streaming ingestion + continuous aggregation — the Spark
  * analogue of the reference's TCP ingest path and WAL
  * (reference: akumulid/tcp_server.cpp session loop,
  * storage_engine/input_log.cpp; continuous queries
  * functests/test_continuous_queries.py). Checkpointing gives the WAL's
  * crash-recovery contract for free; watermarks define the late-data
  * policy the reference lacks (it rejects out-of-order writes,
  * AKU_ELATE_WRITE — here lateness inside the watermark is absorbed).
  */
object StreamIngest {

  /** Parse a stream of OpenTSDB `put` lines (socket/file/Kafka source) into
    * sample rows. Stateless per line -> fully parallel. */
  def parseOpenTsdbStream(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.flatMap { l =>
      try LineProtocol.parseOpenTsdb(l)
      catch { case _: IllegalArgumentException => Nil } // bad line -> dropped
    }.toDF()
  }

  /** Append sink in the engine's layout: parquet partitioned by
    * (metric, day). `checkpoint` is the WAL: exactly-once per micro-batch
    * across restarts. */
  def writeLayoutStream(samples: DataFrame, path: String,
                        checkpoint: String): DataStreamWriter[Row] =
    samples
      .withColumn("day", expr(s"ts div ${graft.io.Ingest.DayNs}L"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("metric", "day")
      .outputMode(OutputMode.Append)

  /** Continuous group-aggregate: per (series, bucket) min/max/sum/count
    * over event-time windows with a watermark — the streaming analogue of
    * Q4 (reference continuous queries read the tail repeatedly; here the
    * aggregation is incremental). `stepNs` buckets anchor at epoch. */
  def continuousGroupAggregate(samples: DataFrame, stepNs: Long,
                               latenessSec: Int = 60): DataFrame = {
    val withEvent = samples
      .withColumn("event_time", timestamp_micros((col("ts") / 1000L).cast("long")))
      .withColumn("bucket_ts",
        (col("ts") - pmod(col("ts"), lit(stepNs))).cast("long"))
      .withColumn("sname",
        TsStore.snameOf(col("metric"), TsStore.tagStr(col("tags"))))
    withEvent
      .withWatermark("event_time", s"$latenessSec seconds")
      .groupBy(col("sname"), col("bucket_ts"),
        window(col("event_time"), s"${stepNs / 1000000L} milliseconds"))
      .agg(
        min(col("value")).as("min"), max(col("value")).as("max"),
        sum(col("value")).as("sum"), count(col("value")).as("count"),
        avg(col("value")).as("mean"))
      .drop("window")
  }

  /** Streaming EWMA per series via mapGroupsWithState — the stateful
    * pipeline nodes (ewma/sma) in their streaming form (SURVEY §2.5:
    * `KeyValueGroupedDataset.mapGroupsWithState` for custom state).
    * Emits the latest forecast per series each micro-batch. */
  def streamingEwma(samples: DataFrame, decay: Double): Dataset[(String, Double)] = {
    import samples.sparkSession.implicits._
    implicit val stateEnc: org.apache.spark.sql.Encoder[graft.functions.EwmaState] =
      org.apache.spark.sql.Encoders.kryo[graft.functions.EwmaState]
    val keyed = samples
      .withColumn("sname",
        TsStore.snameOf(col("metric"), TsStore.tagStr(col("tags"))))
      .select(col("sname").as[String], col("ts").as[Long],
        col("value").as[Double])
      .as[(String, Long, Double)]
      .groupByKey(_._1)
    keyed.mapGroupsWithState(GroupStateTimeout.NoTimeout) {
      (key: String, rows: Iterator[(String, Long, Double)],
       state: GroupState[graft.functions.EwmaState]) =>
        val st = state.getOption.getOrElse(new graft.functions.EwmaState(decay, delta = false))
        var last = Double.NaN
        // feed in event-time order within the batch
        rows.toSeq.sortBy(_._2).foreach { case (_, _, v) => last = st.step(v) }
        state.update(st)
        key -> last
    }
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Final-mile corpus I/O: deterministic training-shard export with a
  * layout-derived manifest, and JSONL ingestion with corrupt-line
  * quarantine — the entry and exit formats of a crawl-to-training-mix
  * pipeline. */
object CorpusIo {

  /** Deterministic shard id: pmod(md5-60(id), nShards). Stable across
    * runs AND engines (the DuckDB twin is the md5Int60Sql family), so a
    * resumed or re-run export reproduces the same membership, and any
    * subset of shards is an unbiased corpus sample — the property
    * curriculum/data loaders rely on when they read shard prefixes. */
  def shardId(id: Column, nShards: Int): Column = {
    require(nShards >= 1, "nShards must be positive")
    pmod(Dedup.md5Hash60(id.cast("string")), lit(nShards.toLong)).cast("int")
  }

  /** Write the corpus as `shard=NN/` training shards. Hash sharding is
    * size-balanced in expectation and embarrassingly parallel: one
    * repartition on the shard key, one file set per shard directory.
    * At 100 TB shards are the training-loader unit — readers consume
    * shard directories independently, and partition pruning serves
    * "shards 0..7 of 512" without listing the rest.
    *
    * `shuffled = true` additionally sorts each shard by a second salted
    * hash of the id, so a sequential read of the shard files IS a
    * deterministic global shuffle (the training loader needs no
    * shuffle pass of its own); the sort is within-partition only —
    * no extra exchange. */
  def writeShards(docs: DataFrame, path: String, nShards: Int,
                  idCol: String = "doc_id",
                  shuffled: Boolean = false): Unit = {
    val sharded = docs.withColumn("shard", shardId(col(idCol), nShards))
      .repartition(col("shard"))
    // the sort leads with the partition column so it SATISFIES the
    // writer's required ordering — otherwise V1Writes inserts its own
    // Sort(shard) and the optimizer eliminates this one, silently
    // un-shuffling the files
    val ordered =
      if (shuffled) sharded.sortWithinPartitions(col("shard"),
        Dedup.md5Hash60(concat(lit("order#"), col(idCol).cast("string"))))
      else sharded
    ordered.write.partitionBy("shard").mode("overwrite").parquet(path)
  }

  /** Manifest of a [[writeShards]] layout: per shard, the document
    * count, character mass, and id range — what a training job
    * validates before consuming (missing shard, truncated write, skew).
    * Derived from the layout files themselves, so it can never disagree
    * with the data. One partition-pruned aggregate. */
  def shardManifest(spark: SparkSession, path: String,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("shard").cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))

  /** Parse JSONL lines against an ENFORCED schema (never inferred —
    * inference is a second full pass and drifts between snapshots).
    * Built on `from_json` over a text scan rather than the json READER's
    * corrupt-record channel, which cannot be filtered without caching
    * the whole scan (Spark's documented limitation) — a non-starter at
    * crawl scale. `from_json` in PERMISSIVE mode yields an all-null
    * struct for a malformed line (indistinguishable from a valid `{}`),
    * so corruption is detected through an explicit corrupt-record field
    * spliced into the parse schema: `__ok` ⇔ that field stayed null.
    * Narrow projection, codegen, no shuffle. */
  def parseJsonl(lines: DataFrame, schema: StructType,
                 lineCol: String = "value"): DataFrame = {
    require(!schema.fieldNames.contains("__corrupt"),
      "schema may not define __corrupt (reserved for the parse channel)")
    val parseSchema = schema.add("__corrupt", "string")
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "__corrupt")
    lines
      .select(col(lineCol).as("__raw"),
        from_json(col(lineCol), parseSchema, opts).as("__r"))
      .select(Seq(col("__raw")) ++
        schema.fieldNames.toSeq.map(f => col(s"__r.$f")) :+
        col("__r.__corrupt").isNull.as("__ok"): _*)
  }

  /** Clean rows of a JSONL corpus directory: parsed columns only, bad
    * lines dropped. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    parseJsonl(spark.read.text(path), schema)
      .filter(col("__ok")).drop("__raw", "__ok")

  /** Quarantine side of [[readJsonl]]: the raw unparseable lines, kept
    * for triage (a rising quarantine rate is the first signal a crawler
    * changed its output format). */
  def readJsonlQuarantine(spark: SparkSession, path: String,
                          schema: StructType): DataFrame =
    parseJsonl(spark.read.text(path), schema)
      .filter(!col("__ok")).select(col("__raw").as("raw_line"))
}

package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media travels
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a per-partition batch map (the Scala analogue of
  * `mapInPandas` — one JVM-side batch loop per partition, vectorizable).
  *
  * The actual codecs (JPEG decode, audio resample, video frame-sample)
  * are NOT available in this container, so the decode kernel is STUBBED
  * with a deterministic fake (content-hash-seeded); everything around it
  * — schema, batching, partition sizing, output shape — is real and
  * tested, so swapping in a real codec is a one-function change.
  */
object Multimodal {

  /** Typed media row: the canonical wide-table layout. Partition by
    * (modality, shard) at scale so decode stages are pruned per modality;
    * keep blobs under the parquet row-group target (~128 MB). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType),                    // opaque payload
    StructField("mime", StringType),
    StructField("width", IntegerType),                     // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),                  // audio/video
    StructField("caption", StringType)))

  /** The one mediaSchema projection both fake-corpus builders share:
    * id-derived modality/dims/duration, sha256-digest-bytes content
    * (a fixed 64-byte payload, bit-reproducible in SQL). */
  private def mediaProjection(df: DataFrame, id: org.apache.spark.sql.Column,
                              hashSrc: org.apache.spark.sql.Column,
                              caption: org.apache.spark.sql.Column): DataFrame =
    df.select(
      id.as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (id % 3 + 1).cast("int")).as("modality"),
      sha2(hashSrc, 256).cast("binary").as("content"),
      lit("application/octet-stream").as("mime"),
      (id % 640 + 32).cast("int").as("width"),
      (id % 480 + 32).cast("int").as("height"),
      (id % 30000 + 1000).as("duration_ms"),
      caption.as("caption"))

  /** Deterministic fake corpus: blob bytes derived from media_id so tests
    * are reproducible without real media files. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame =
    mediaProjection(spark.range(n.toLong).toDF(), col("id"),
      col("id").cast("string"), concat(lit("caption "), col("id")))

  /** Media table derived from the documents corpus: a data-driven variant
    * of [[syntheticMedia]] for oracle-gated tests. Content is the UTF-8
    * bytes of the text's sha256 hex digest, so the deterministic
    * decode/resize kernels round-trip exactly through a DuckDB oracle. */
  def fromDocuments(docs: DataFrame): DataFrame =
    mediaProjection(docs, col("doc_id"), col("text"), col("text"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType),
    StructField("feature", ArrayType(FloatType)),  // embedding-shaped
    StructField("decode_ok", BooleanType)))

  /** STUB decode kernel: a real implementation would parse `content`
    * with an image/audio codec; here the "feature" is a deterministic
    * 8-dim projection of the payload bytes. Signature and batch shape are
    * the real contract. */
  private[llm] def decodeKernel(content: Array[Byte]): Option[Array[Float]] = {
    if (content == null || content.isEmpty) None
    else {
      val out = new Array[Float](8)
      var i = 0
      while (i < content.length) {
        out(i % 8) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      val n = math.max(1, content.length / 8)
      Some(out.map(_ / n))
    }
  }

  /** Feature extraction over the media table: per-partition batch loop
    * (constant memory per partition, blobs never collected). At scale,
    * `repartition` first so each task holds ~targetPartitionBytes of
    * blobs; the stage is a pure map — no shuffle. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val schema = media.schema
    val idIdx = schema.fieldIndex("media_id")
    val modIdx = schema.fieldIndex("modality")
    val cIdx = schema.fieldIndex("content")
    media.mapPartitions { it =>
      it.map { row =>
        val feat = decodeKernel(row.getAs[Array[Byte]](cIdx))
        Row(row.getLong(idIdx), row.getString(modIdx),
          feat.orNull, feat.isDefined)
      }
    }(Encoders.row(featureSchema))
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("resize_ok", BooleanType)))

  /** STUB resize kernel: a real implementation decodes, scales to
    * (targetW, targetH) preserving aspect, re-encodes. The deterministic
    * fake derives bytes from (content, target dims) so tests are
    * reproducible; the batch loop, schema, and size metadata are the
    * real contract. */
  private[llm] def resizeKernel(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    if (content == null || content.isEmpty) None
    else {
      val out = new Array[Byte](math.min(content.length, 64))
      var i = 0
      while (i < out.length) {
        out(i) = (content(i) ^ (w * 31 + h)).toByte
        i += 1
      }
      Some(out)
    }

  /** Image resize stage over the media table: per-partition batch map,
    * image rows only (partition pruning when the table is partitioned by
    * modality). */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val images = media.filter(col("modality") === "image")
    val schema = images.schema
    val idIdx = schema.fieldIndex("media_id")
    val cIdx = schema.fieldIndex("content")
    images.mapPartitions { it =>
      it.map { row =>
        val r = resizeKernel(row.getAs[Array[Byte]](cIdx), targetW, targetH)
        Row(row.getLong(idIdx), r.orNull, targetW, targetH, r.isDefined)
      }
    }(Encoders.row(resizedSchema))
  }

  /** Frame-sampling plan for video rows: expands each video into
    * `fps`-spaced frame REFERENCES (no decode; offsets only) — the shape
    * a downstream batch decoder consumes. Pure column math. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("modality") === "video" && col("duration_ms") > 0)
      // zero/negative durations yield no frames; without the guard,
      // sequence(0, -1, everyMs) rejects the whole job at runtime
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_offset_ms"))
}

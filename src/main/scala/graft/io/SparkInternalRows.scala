package org.apache.spark.sql.graftio

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `SparkSession.internalCreateDataFrame` (which is
  * `private[sql]`, hence this package). Lets a parser emit catalyst
  * `InternalRow`s directly — skipping the object->row encoder
  * (`SerializeFromObject`) that re-encodes every string of every sample.
  * The ingest hot path caches one `UTF8String` per series-level value, so
  * per-sample work drops to an array fill; see `graft.io.Ingest`. */
object InternalRows {
  def toDF(spark: SparkSession, rdd: RDD[InternalRow],
           schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}

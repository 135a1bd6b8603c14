package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (BASELINE north star): media as opaque binary
  * columns with typed metadata, decoded/feature-extracted in batched
  * partition-local passes.
  *
  * Real image/audio decoders aren't available in this container, so
  * [[decodeStub]] is a clearly-marked deterministic fake — but the Spark-side
  * plumbing is real: a binary payload column, a typed metadata struct, and a
  * `mapPartitions` pass that would host the decoder (one library/model load
  * per partition, batched work per row — the same shape a Pandas-UDF
  * `mapInPandas` decode takes in PySpark).
  */
object Multimodal {

  final case class MediaMeta(docId: Long, byteLen: Long, format: String,
      width: Int, height: Int, checksum: String)

  /** Attach an opaque binary payload column (here derived from text — the
    * testdata has no real media) plus lightweight relational metadata. */
  def asBinaryTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol), col(payloadCol).cast("binary").as("payload"))
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))

  /** STUB decoder: deterministic fake dimensions from the payload bytes.
    * A real deployment replaces the body with an actual image/audio decode;
    * everything around it (partitioning, batching, output schema) stays. */
  def decodeStub(spark: SparkSession, media: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col("payload"), col("checksum"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // real decoder init would happen once per partition here
        it.map { case (id, bytes, sum) =>
          val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
          val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
          MediaMeta(id, bytes.length.toLong, if (b0 % 2 == 0) "png" else "jpeg",
            64 + (b0 % 64), 64 + (b1 % 64), sum)
        }
      }
  }
}

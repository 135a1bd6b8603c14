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

  /** Frame-level near-duplicate detection — the video-dedup pattern (per
    * frame: decode → perceptual feature → cell-blocked candidate join →
    * distance verify → per-pair rollup), with the perceptual feature
    * standing in as a 4-class character histogram of the frame (the decode
    * seat is [[decodeStub]]'s; a real deployment swaps in pHash/embedding
    * features and keeps every shape below).
    *
    * Blocking: histogram dims quantized by `cellWidth` form the cell key;
    * only same-cell cross-doc frame pairs are candidates (bounded fanout,
    * the d2/d9 discipline), verified at L1 distance <= `tau`. Deterministic
    * end to end, so the oracle replicates it exactly — recall below 1.0 at
    * cell boundaries is inherent to blocking and identical on both engines.
    *
    * Output: (id_a, id_b, n_near_frames) for doc pairs sharing >= 1
    * near-dup frame, id_a < id_b. */
  def frameNearDups(df: DataFrame, idCol: String, textCol: String,
      frameChars: Int = 256, cellWidth: Int = 4, tau: Int = 2): DataFrame = {
    def cls(c: String, pat: String): org.apache.spark.sql.Column =
      (length(col(c)) - length(regexp_replace(col(c), pat, ""))).cast("long")
    val frames = df
      .select(col(idCol), col(textCol))
      .filter(length(col(textCol)) > 0)
      .withColumn("frame_no",
        explode(sequence(lit(0), ((length(col(textCol)) - 1) / frameChars).cast("int"))))
      .withColumn("frame",
        expr(s"substring($textCol, frame_no * $frameChars + 1, $frameChars)"))
      .select(col(idCol), col("frame_no"),
        cls("frame", "[a-i]").as("h1"), cls("frame", "[j-r]").as("h2"),
        cls("frame", "[s-z]").as("h3"),
        (length(col("frame")) - cls("frame", "[a-z]")).as("h4"))
      .withColumn("cell", concat_ws("|",
        (col("h1") / cellWidth).cast("long"), (col("h2") / cellWidth).cast("long"),
        (col("h3") / cellWidth).cast("long"), (col("h4") / cellWidth).cast("long")))
    val a = frames.toDF(Seq("id_a", "fno_a", "a1", "a2", "a3", "a4", "cell"): _*)
    val b = frames.toDF(Seq("id_b", "fno_b", "b1", "b2", "b3", "b4", "cell"): _*)
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(
        abs(col("a1") - col("b1")) + abs(col("a2") - col("b2")) +
        abs(col("a3") - col("b3")) + abs(col("a4") - col("b4")) <= tau)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_near_frames"))
  }

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

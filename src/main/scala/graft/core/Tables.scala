package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Named-table IO over a scale-factor directory of parquet files.
  *
  * The reference keeps one logical table per S3 CSV key and re-reads it in every
  * stage (`/root/reference/data_pipeline/upload_data.py:69-95`,
  * `shared/data_loader.py:14-29`). Here a "database" is a directory of parquet
  * tables; reads are lazy scans so Catalyst can push filters/projections into
  * the parquet reader (column pruning + predicate pushdown are the first-order
  * wins at 100 TB — the reference always reads whole files).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** S2: full-table overwrite sink — the reference's whole-file S3 put
    * (`upload_data.py:37-46`), as a proper partition-parallel writer.
    * `atomic = true` routes the overwrite through the [[TableSwap]]
    * commit protocol: plain mode("overwrite") deletes the target before the
    * new files land, so a crash mid-write leaves a partial directory that
    * LOOKS like a complete table to the next reader. Any table that carries
    * a `._GRAFT_TABLE` marker (i.e. participates in recover/compact) must
    * be written with `atomic = true`.
    * `partitionCols` lays the table out hive-style (`col=value/` dirs) so
    * reads carrying a predicate on those columns prune whole directories at
    * planning time — for a date-partitioned fact at 100 TB, a trailing-28d
    * mart touches 28 partitions instead of the full history (SURVEY §7.4).
    * Partition columns should be LOW-cardinality (dates, sources): each
    * value is a directory, and a high-cardinality key would shatter the
    * table into millions of small files. */
  def write(df: DataFrame, path: String, format: String = "parquet",
      atomic: Boolean = false, partitionCols: Seq[String] = Nil): Unit = {
    def save(p: String): Unit =
      df.write.mode("overwrite").format(format)
        .partitionBy(partitionCols: _*)
        .option("header", "true") // no-op for parquet, header for csv parity
        .save(p)
    if (atomic) {
      TableSwap.recover(df.sparkSession, path)
      TableSwap.commit(df.sparkSession, path)(save)
    } else save(path)
  }

  /** S3: snapshot sink — besides the live table, a dated immutable copy
    * (`pipeline_handler.py:343-354` writes `…_YYYY-MM-DD` on month start). */
  def writeSnapshot(df: DataFrame, basePath: String, asOfDate: String,
      format: String = "parquet"): Unit = {
    write(df, basePath, format)
    write(df, s"${basePath}_$asOfDate", format)
  }

  final case class CompactStats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Small-file compaction: rewrite a directory-backed parquet table into
    * ceil(bytes / targetBytes) files under the [[TableSwap]] atomic-replace
    * protocol. Incremental ingest (streaming upserts, per-batch appends)
    * accumulates files far smaller than a scan-efficient split — at warehouse
    * scale the resulting per-file open/footer overhead dominates scan time,
    * so compaction is a first-class maintenance op, not an afterthought.
    * No-ops (without rewriting) when the table already has that few files.
    * The rewrite is one round-robin repartition — no shuffle key, content
    * preserved as a set. */
  def compact(spark: SparkSession, tableDir: String,
      targetBytes: Long = 128L << 20): CompactStats = {
    TableSwap.recover(spark, tableDir)
    val path = new org.apache.hadoop.fs.Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(path).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val bytes = dataFiles.map(_.getLen).sum
    val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (dataFiles.length <= target)
      return CompactStats(dataFiles.length, dataFiles.length, bytes)
    val df = spark.read.parquet(tableDir).repartition(target)
    TableSwap.commit(spark, tableDir)(df.write.parquet(_))
    CompactStats(dataFiles.length, target, bytes)
  }

  /** Time-travel read over [[writeSnapshot]]'s dated copies: the newest
    * snapshot at or before `asOfDate` (ISO dates order lexically, so the
    * resolution is a pure name comparison — no file opens). Errors out when
    * nothing that old exists rather than silently serving a later state. */
  def asOf(spark: SparkSession, basePath: String, asOfDate: String): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = base.getName + "_"
    val dateShape = "\\d{4}-\\d{2}-\\d{2}".r
    val dates = fs.listStatus(base.getParent).map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) => n.stripPrefix(prefix) }
      .filter(d => dateShape.matches(d) && d <= asOfDate)
    require(dates.nonEmpty, s"no snapshot of $basePath at or before $asOfDate")
    spark.read.parquet(s"${basePath}_${dates.max}")
  }

  /** S1 CSV parity source: schema-on-read CSV with explicit StructType and
    * null-on-error coercion, matching `pd.read_csv` + `to_datetime(errors=
    * 'coerce')` (`shared/data_loader.py:21-28`). */
  def readCsv(s: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.read.option("header", "true").option("mode", "PERMISSIVE").schema(schema).csv(path)

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet generations. The original files
    * store TIMESTAMP(NANOS), which Spark 4 rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by every session builder
    * in this repo) — that reads it as epoch-nanos LongType, converted here to
    * microsecond TimestampType by integral division, the exact truncation
    * DuckDB applies when it reads the same file as TIMESTAMP. Regenerated
    * files store TIMESTAMP(MICROS, isAdjustedToUTC=false); every session also
    * sets `spark.sql.parquet.inferTimestampNTZ.enabled=false` so those read
    * as plain (UTC-session) TimestampType with the same epoch-micros values
    * DuckDB sees — not TIMESTAMP_NTZ, which half the time-axis functions
    * (`unix_micros` etc.) reject. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

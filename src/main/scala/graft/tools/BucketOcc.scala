package graft.tools

import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the LSH band-bucket occupancy distribution for the documents
  * table at a given sf dir — the number every occupancy-cap default must be
  * chosen against (cap above the observed honest max, so capped and
  * uncapped candidates are bit-identical at gated scales; the cap exists
  * for the pathological bucket the synthetic corpus doesn't have).
  *
  * Usage: runMain graft.tools.BucketOcc <sfDir> [k] [numHashes] [bandSize]
  */
object BucketOcc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 3
    val nh = if (args.length > 2) args(2).toInt else 8
    val bs = if (args.length > 3) args(3).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val bands = Dedup.lshBands(
      Dedup.minhash(Dedup.shingles(docs, "doc_id", "text", k, dedup = false),
        "doc_id", nh), "doc_id", bs, nh)
    val occ = bands.groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n"))
    val stats = occ.agg(count(lit(1)).as("buckets"), max(col("n")).as("max"),
      expr("percentile(n, 0.999)").as("p999"), avg(col("n")).as("mean")).head()
    println(s"OCC sf=$sfDir buckets=${stats.getLong(0)} max=${stats.getLong(1)} " +
      s"p999=${stats.get(2)} mean=${stats.getDouble(3)}")
    occ.orderBy(col("n").desc).limit(5).collect()
      .foreach(r => println(s"TOP band=${r.get(0)} n=${r.get(2)}"))
    spark.stop()
  }
}

package graft.tools

import graft.core.Tables
import graft.ops.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the SRP band-bucket occupancy distribution and candidate-pair
  * volume for the embeddings table — the number behind k4/k5/k16's
  * candidate stage. A `bits`-bit band has only 2^bits values, so candidate
  * pairs have a floor of n²/2^(bits+1) per band: quadratic in the corpus
  * (the k5 sf10 blow-up: 595 s for 80k vectors at bits = 6).
  *
  * Usage: runMain graft.tools.SrpOcc <sfDir> [bands] [bits]
  */
object SrpOcc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bands = if (args.length > 1) args(1).toInt else 4
    val bits = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val banded = SimilaritySearch.srpBanded(emb, "vec_id", "embedding",
      dim = 64, bands, bits)
    val occ = banded.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("occ"))
    val st = occ.agg(
      sum(expr("occ * (occ - 1) / 2")).as("cand_pairs"),
      max(col("occ")).as("max_occ"),
      expr("CAST(percentile(occ, 0.99) AS BIGINT)").as("p99"),
      count(lit(1)).as("buckets")).head()
    println(s"SRP_OCC sf=$sfDir bands=$bands bits=$bits " +
      s"cand_pairs=${st.get(0)} max_occ=${st.get(1)} p99=${st.get(2)} " +
      s"buckets=${st.get(3)}")
    spark.stop()
  }
}

package graft.tools

import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the simhash64 4×16-bit band occupancy distribution and the
  * resulting candidate-pair volume (Σ occ·(occ−1)/2 per band) plus the
  * hamming-verified edge count — the numbers behind the d5/gr3/gr4
  * candidate stage. A 16-bit band has 65,536 values, so CHANCE collisions
  * alone put n²/2^17 pairs per band on the verify stage: quadratic in the
  * corpus (the birthday effect), invisible at small n, dominant at sf10.
  *
  * Usage: runMain graft.tools.SimhashOcc <sfDir>
  */
object SimhashOcc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    val docs = Tables.documents(spark, sfDir)
    val sig = Dedup.simhash64Bands(docs, "doc_id", "text")
      .localCheckpoint(true)
    val n = sig.count()
    val occ = (0 until 4).map { k =>
      sig.groupBy(col(s"b$k").as("sig")).agg(count(lit(1)).as("occ"))
        .withColumn("band", lit(k))
    }.reduce(_ unionByName _)
    val st = occ.agg(
      sum(expr("occ * (occ - 1) / 2")).as("cand_pairs"),
      max(col("occ")).as("max_occ"),
      count(lit(1)).as("buckets")).head()
    println(s"SIMHASH_OCC sf=$sfDir docs=$n cand_pairs=${st.get(0)} " +
      s"max_occ=${st.get(1)} buckets=${st.get(2)}")
    for (cap <- Seq(64, 128, 256, 512, 1024)) {
      val capped = occ.agg(sum(
        when(col("occ") <= cap, expr("occ * (occ - 1) / 2"))
          .otherwise(col("occ") - 1)).as("p")).head().get(0)
      println(s"SIMHASH_CAP cap=$cap pairs=$capped")
    }
    val edges = Dedup.simhash64NearDup(docs, "doc_id", "text", 3).count()
    println(s"SIMHASH_EDGES sf=$sfDir hamming3_edges=$edges")
    spark.stop()
  }
}

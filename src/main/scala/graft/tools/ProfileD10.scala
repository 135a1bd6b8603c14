package graft.tools

import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage probe for d10 (exact AllPairs+PPJoin join): times the shingle
  * spine, the ranked spine, the prefix index, the candidate join, and the
  * fused verify — all via `Dedup.prefixJaccardStages`/`prefixJaccardVerify`,
  * the PRODUCTION code paths, so the probe can never drift from the shape
  * it claims to measure.
  * Usage: runMain graft.tools.ProfileD10 <sfDir> [reps] */
object ProfileD10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (tauNum, tauDen, k) = (1, 2, 3)
    def docs = Tables.documents(spark, sfDir)
    def stages = Dedup.prefixJaccardStages(docs, "doc_id", "text",
      tauNum, tauDen, k)
    val probes: Seq[(String, () => Long)] = Seq(
      "tok" -> (() => Dedup.shingles(docs, "doc_id", "text", k).count()),
      "pref" -> (() => stages._2.count()),
      "cand" -> (() => stages._3.count()),
      "full" -> (() => Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        tauNum, tauDen, shingleK = k).count()))
    probes.foreach { case (_, f) => f() } // warm
    probes.foreach { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROFILE $name%-6s ${ts(ts.length / 2)}%7.3f s")
    }
    spark.stop()
  }
}

package graft.tools

import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** Stage probe for d11 (exact weighted-cosine AllPairs join): times the
  * weighted postings, the ranked spine, the filtered candidate pairs, and
  * the full query — all via `Dedup.cosineStages`/`cosineVerify`, the
  * PRODUCTION code paths, so the probe can never drift from the shape it
  * claims to measure. Also prints stage VOLUMES (one line each), because
  * the costs here are volume-driven (candidates ∝ Σ dup-cluster²).
  * Usage: runMain graft.tools.ProfileD11 <sfDir> [reps] */
object ProfileD11 {
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

    val (tauNum, tauDen, k) = (3, 5, 3)
    def docs = Tables.documents(spark, sfDir)
    // the stages checkpoint EAGERLY, so a probe must run over a PREBUILT
    // predecessor or its timing silently includes every upstream stage
    val w0 = Dedup.cosinePostings(docs, "doc_id", "text", k)
    val ranked0 = Dedup.cosineRanked(w0, "doc_id")
    val cand0 = Dedup.cosineCand(ranked0, "doc_id", tauNum, tauDen)
    val probes: Seq[(String, () => Long)] = Seq(
      "postings" -> (() => Dedup.cosinePostings(docs, "doc_id", "text", k).count()),
      "ranked" -> (() => Dedup.cosineRanked(w0, "doc_id").count()),
      "cand" -> (() => Dedup.cosineCand(ranked0, "doc_id", tauNum, tauDen).count()),
      "verify" -> (() => Dedup.cosineVerify(ranked0, cand0, "doc_id",
        tauNum, tauDen).count()),
      "full" -> (() => Dedup.cosinePrefixPairs(docs, "doc_id", "text",
        tauNum, tauDen, shingleK = k).count()))
    val vols = probes.map { case (name, f) => name -> f() } // warm + volumes
    vols.foreach { case (name, v) => println(f"VOLUME  $name%-8s $v%12d rows") }
    probes.foreach { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROFILE $name%-8s ${ts(ts.length / 2)}%7.3f s")
    }
    spark.stop()
  }
}

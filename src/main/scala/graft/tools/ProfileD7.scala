package graft.tools

import graft.core.Tables
import graft.ops.{Dedup, Identity, SimilaritySearch}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage probe for d7 (SemDeDup semantic dedup — the warehouse's top sf10
  * job as embedding_dedup_clusters): times the SRP band stream, the bucket
  * occupancy audit, the ring candidate join, the exact-cosine verify, and
  * the CC collapse — all via the PRODUCTION code paths (srpBanded /
  * lshCandidatesRing / connectedComponents), so the probe cannot drift from
  * the shape it claims to measure. Stage volumes print first: every cost
  * here is candidate-volume-driven.
  * Usage: runMain graft.tools.ProfileD7 <sfDir> [reps] */
object ProfileD7 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      graft.core.Sizing.shufflePartitions(sfDir, cpus.toInt).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (dim, bands, bits, threshold, window) = (64, 4, 6, 0.4, 256)
    def emb = Tables.embeddings(spark, sfDir)
    // prebuilt predecessors: srpBanded checkpoints the signature table, so
    // downstream stage timings exclude the upstream they consumed
    val banded0 = SimilaritySearch.srpBanded(emb, "vec_id", "embedding",
      dim, bands, bits)
    val cand0 = Dedup.lshCandidatesRing(banded0, "vec_id", window)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    def verifyOf(cand: org.apache.spark.sql.DataFrame) = {
      graft.plans.FloatDot.register(spark)
      val withNorm = emb.select(col("vec_id"), col("embedding"),
        sqrt(expr(SimilaritySearch.normSqExpr("embedding")).cast("double"))
          .as("__norm"))
      cand
        .join(withNorm.toDF("ja", "vec_a", "norm_a"), col("id_a") === col("ja"))
        .join(withNorm.toDF("jb", "vec_b", "norm_b"), col("id_b") === col("jb"))
        .withColumn("cos_sim",
          round(expr(SimilaritySearch.dotExpr("vec_a", "vec_b")) /
            (col("norm_a") * col("norm_b")), 6))
        .filter(col("cos_sim") >= threshold)
        .select(col("id_a"), col("id_b"))
    }
    def verify0 = verifyOf(cand0)
    val edges0 = verify0.localCheckpoint(true)
    // yield A/B: the similarity-ordered ring (fine SRP code from fresh
    // planes) vs the salted-hash ring — same occ·window candidate budget,
    // how many TRUE (cos >= threshold) edges does each surface?
    val fineEdges = {
      graft.plans.FloatDot.register(spark)
      val fine = emb.select(col("vec_id"),
        SimilaritySearch.srpFineCol("embedding", bands * bits, 16, dim)
          .as("__fine"))
      verifyOf(Dedup.lshCandidatesRing(banded0.join(fine, "vec_id"), "vec_id",
        window, Some("__fine")).select(col("id_a"), col("id_b"))).count()
    }
    println(f"YIELD   ring_hash  ${edges0.count()}%12d true edges (of the same candidate budget)")
    println(f"YIELD   ring_fine  $fineEdges%12d true edges (of the same candidate budget)")
    // optional ground truth (3rd arg "truth"): the EXHAUSTIVE candidate set
    // verified — n²/2^(bits+1)-floor work, affordable as a one-off denominator
    if (args.length > 2 && args(2) == "truth") {
      val truth = verifyOf(Dedup.lshCandidates(banded0, "vec_id")
        .select(col("id_a"), col("id_b"))).count()
      println(f"YIELD   exhaustive $truth%12d true edges (ground truth)")
    }
    // recall-vs-window curve (3rd arg "curve", 4th "w1,w2,..."): ground
    // truth once, then per window the fine-ordered ring's candidate volume,
    // surfaced true edges, recall, and wall — the measurement that backs
    // SimilaritySearch.RingCoverage's declared recall target.
    if (args.length > 3 && args(2) == "curve") {
      graft.plans.FloatDot.register(spark)
      val truth = verifyOf(Dedup.lshCandidates(banded0, "vec_id")
        .select(col("id_a"), col("id_b"))).count()
      println(f"CURVE   truth $truth%12d true edges (exhaustive denominator)")
      val fine = emb.select(col("vec_id"),
        SimilaritySearch.srpFineCol("embedding", bands * bits, 16, dim)
          .as("__fine"))
      val bandedFine = banded0.join(fine, "vec_id").localCheckpoint(true)
      args(3).split(",").map(_.trim.toInt).foreach { w =>
        val t0 = System.nanoTime()
        val cand = Dedup.lshCandidatesRing(bandedFine, "vec_id", w,
          Some("__fine")).select(col("id_a"), col("id_b"))
          .localCheckpoint(true)
        val nCand = cand.count()
        val hits = verifyOf(cand).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"CURVE   window=$w%-6d cand=$nCand%12d true=$hits%9d " +
          f"recall=${hits * 100.0 / truth}%5.1f%% wall=$secs%7.1f s")
      }
      spark.stop(); return
    }
    // (bands,bits,window) Pareto grid (3rd arg "grid", 4th "b:k:w,..."):
    // ONE fixed denominator — the production config's (bands=4, bits=6)
    // exhaustive-LSH true-edge set, the same denominator RingCoverage's
    // declared ≥60% target is stated against — then per config the
    // end-to-end wall (band stream → fine order → ring → verify), candidate
    // volume, surfaced true edges, and recall vs that FIXED set (edge
    // intersection, not a count ratio — a config finding different edges
    // must not masquerade as recall). Answers the bits-vs-ring-width
    // question: does more bits + a narrower ring reach the target cheaper?
    if (args.length > 3 && args(2) == "grid") {
      graft.plans.FloatDot.register(spark)
      val truth = verifyOf(Dedup.lshCandidates(banded0, "vec_id")
        .select(col("id_a"), col("id_b"))).localCheckpoint(true)
      val nTruth = truth.count()
      println(f"GRID    truth(4x6 exhaustive) $nTruth%12d true edges (fixed denominator)")
      args(3).split(",").map(_.trim).filter(_.nonEmpty).foreach { spec =>
        val Array(b, k, w) = spec.split(":").map(_.toInt)
        val t0 = System.nanoTime()
        val banded = SimilaritySearch.srpBanded(emb, "vec_id", "embedding",
          dim, b, k)
        val fine = emb.select(col("vec_id"),
          SimilaritySearch.srpFineCol("embedding", b * k, 16, dim)
            .as("__fine"))
        val cand = Dedup.lshCandidatesRing(banded.join(fine, "vec_id"),
          "vec_id", w, Some("__fine"))
          .select(col("id_a"), col("id_b")).localCheckpoint(true)
        val nCand = cand.count()
        val found = verifyOf(cand).localCheckpoint(true)
        val nFound = found.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val hits = found.intersect(truth).count()
        println(f"GRID    bands=$b bits=$k window=$w%-6d cand=$nCand%12d " +
          f"true=$nFound%9d recallVsRef=${hits * 100.0 / nTruth}%5.1f%% " +
          f"wall=$secs%7.1f s")
      }
      spark.stop(); return
    }
    val probes: Seq[(String, () => Long)] = Seq(
      "banded" -> (() => SimilaritySearch.srpBanded(emb, "vec_id", "embedding",
        dim, bands, bits).count()),
      "occ" -> (() => banded0.groupBy(col("band"), col("sig"))
        .agg(count(lit(1)).as("occ")).agg(max(col("occ"))).count()),
      "ring_cand" -> (() => Dedup.lshCandidatesRing(banded0, "vec_id", window).count()),
      "verify" -> (() => verify0.count()),
      "cc" -> (() => Identity.connectedComponents(
        emb.select(col("vec_id").as("id")),
        edges0.select(col("id_a").as("src"), col("id_b").as("dst"))).count()),
      "full" -> (() => SimilaritySearch.semanticDedup(emb, "vec_id", "embedding",
        dim, bands, bits, threshold).count()))
    val vols = probes.map { case (name, f) => name -> f() } // warm + volumes
    vols.foreach { case (name, v) => println(f"VOLUME  $name%-10s $v%12d rows") }
    probes.foreach { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROFILE $name%-10s ${ts(ts.length / 2)}%7.3f s")
    }
    spark.stop()
  }
}

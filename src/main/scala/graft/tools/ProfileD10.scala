package graft.tools

import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage probe for d10 (exact AllPairs+PPJoin join): times the shingle
  * spine, the prefix candidate join, and the exact verify separately.
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

    val (tauNum, tauDen) = (1, 2)
    def docs = Tables.documents(spark, sfDir)
    def tok = Dedup.shingles(docs, "doc_id", "text", 3)
    def pref = {
      val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
      val dfreq = tok.groupBy(col("shingle")).agg(count(lit(1)).as("dfq"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("dfq"), col("shingle"))
      tok.join(dfreq, "shingle")
        .withColumn("rn", row_number().over(wDoc))
        .join(sizes, "doc_id")
        .filter(col("rn") <=
          col("n_tok") - expr(s"(n_tok * $tauNum + ${tauDen - 1}) div $tauDen") + 1)
    }
    def cand = {
      val p = pref
      val a = p.select(col("doc_id").as("id_a"), col("shingle"),
        col("n_tok").as("na"), col("rn").as("ra"))
      val b = p.select(col("doc_id").as("id_b"), col("shingle"),
        col("n_tok").as("nb"), col("rn").as("rb"))
      val sumND = tauNum + tauDen
      a.join(b, Seq("shingle"))
        .filter(col("id_a") < col("id_b") &&
          col("nb") * tauDen >= col("na") * tauNum &&
          col("na") * tauDen >= col("nb") * tauNum)
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("o_pref"),
          max(col("ra")).as("ra_mx"), max(col("rb")).as("rb_mx"),
          max(col("na")).as("na"), max(col("nb")).as("nb"))
        .filter(col("o_pref") +
            least(col("na") - col("ra_mx"), col("nb") - col("rb_mx")) >=
          expr(s"((na + nb) * $tauNum + ${sumND - 1}) div $sumND"))
        .select(col("id_a"), col("id_b"))
    }
    val stages: Seq[(String, () => Long)] = Seq(
      "tok" -> (() => tok.count()),
      "pref" -> (() => pref.count()),
      "cand" -> (() => cand.count()),
      "full" -> (() => Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        tauNum, tauDen, shingleK = 3).count()))
    stages.foreach { case (_, f) => f() } // warm
    stages.foreach { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROFILE $name%-6s ${ts(ts.length / 2)}%7.3f s")
    }
    spark.stop()
  }
}

package graft.tools

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Scale-probe runner: times named registry queries on a scale directory and
  * prints per-query median seconds PLUS the output row count (the volume
  * audit — a probe that only reports wall-clock can hide silent output
  * collapse, the failure mode the sf1/sf3 probes are designed to catch).
  *
  * Usage: `runMain graft.tools.Probe <sfDir> <reps> [q1,q2,...]`
  * (no query list → the headline `bench = true` set). One line per query:
  * `[probe] <name> median_s=<s> rows=<n>` then a total line.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions derive from the probed directory's footprint
    // (graft.core.Sizing): at probe scales >= sf10 the thread-count default
    // puts 10x the intended volume per sort partition and spills. The env
    // knob survives as an explicit A/B override only.
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

    val qs =
      if (args.length > 2) {
        val want = args(2).split(",").map(_.trim).filter(_.nonEmpty)
        val byName = Registry.all.map(q => q.name -> q).toMap
        want.flatMap { n =>
          val q = byName.get(n)
          if (q.isEmpty) System.err.println(s"[probe] unknown query: $n")
          q
        }.toSeq
      } else Registry.all.filter(_.bench)

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }

    var total = 0.0
    qs.foreach { q =>
      // One untimed warm rep PER QUERY: each query pays its own codegen +
      // classloading on first execution, and with the default reps=2 the
      // median of (cold, warm) is their mean — a cold-start artifact, not a
      // scale signal. (An earlier global first-query warm only fixed query
      // #1.) Failed reps are excluded from the timing and marked, never
      // averaged in.
      var rows = -1L
      try rows = q.run(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[probe] ${q.name} warm rep FAILED: ${e.getMessage}")
      }
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = 0
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        try {
          rows = q.run(spark, sfDir).count()
          times += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            failed += 1
            System.err.println(s"[probe] ${q.name} FAILED: ${e.getMessage}")
        }
      }
      if (times.nonEmpty) {
        val m = median(times.toSeq)
        total += m
        val failNote = if (failed > 0) s" failed_reps=$failed" else ""
        println(f"[probe] ${q.name} median_s=$m%.3f min_s=${times.min}%.3f " +
          f"rows=$rows reps_ok=${times.length}/$reps$failNote")
      } else
        println(s"[probe] ${q.name} ALL_REPS_FAILED reps_ok=0/$reps")
    }
    println(f"[probe] TOTAL median_s=$total%.3f queries=${qs.length} sf=$sfDir")
    spark.stop()
  }
}

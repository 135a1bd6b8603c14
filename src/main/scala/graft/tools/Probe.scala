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
    // Deploy-time sizing knob: shuffle partitions default to the thread
    // count (right at the gated scales), but at probe scales >= sf10 the
    // per-partition volume outgrows memory and sorts/aggs spill — a real
    // cluster sizes partitions to the data, so the probe must be able to.
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
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

    // Warm classloading/codegen on the first query so its reading isn't
    // charged for JVM startup (same discipline as Bench).
    qs.headOption.foreach(q =>
      try q.run(spark, sfDir).count() catch { case _: Throwable => () })

    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }

    var total = 0.0
    qs.foreach { q =>
      var rows = -1L
      val ts = Array.fill(reps) {
        val t0 = System.nanoTime()
        rows = try q.run(spark, sfDir).count() catch {
          case e: Throwable =>
            System.err.println(s"[probe] ${q.name} FAILED: ${e.getMessage}")
            -1L
        }
        (System.nanoTime() - t0) / 1e9
      }
      val m = median(ts)
      total += m
      println(f"[probe] ${q.name} median_s=$m%.3f rows=$rows reps=$reps")
    }
    println(f"[probe] TOTAL median_s=$total%.3f queries=${qs.length} sf=$sfDir")
    spark.stop()
  }
}

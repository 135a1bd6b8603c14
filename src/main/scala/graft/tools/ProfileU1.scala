package graft.tools

import graft.core.Tables
import graft.flags.{Ev, FlagRules}
import graft.queries.Q
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level probe for the u1 flag-rules path — decomposes the typed
  * pipeline into its cost layers so a bench drift can be attributed to the
  * events SCAN (parquet/timestamp decode), the typed SHUFFLE+DESERIALIZE
  * (as[Ev] → groupByKey), or the RULES themselves (per-group Scala).
  * Also prints the per-user event-count distribution: the flatMapGroups
  * path is linear in group size where relational ops are not, so a testdata
  * regeneration that densifies users shows up here first.
  *
  * Usage: runMain graft.tools.ProfileU1 <sfDir> [reps]
  */
object ProfileU1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val asOf = 1706659200000000L

    def projected = Tables.events(spark, sfDir)
      .filter(Q.usecs(col("ts")) < asOf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Q.usecs(col("ts")).as("us"), col("value"))
      .toDF("userId", "eventId", "eventType", "us", "value")

    val stages: Seq[(String, () => Long)] = Seq(
      ("scan_count" -> (() => Tables.events(spark, sfDir).count())),
      ("scan_project_us" -> (() => projected.count())),
      // typed shuffle + Ev deserialization + group iteration, rules skipped
      ("typed_group_noop" -> (() => projected.as[Ev].groupByKey(_.userId)
        .flatMapGroups { (_, it) => var n = 0L; it.foreach(_ => n += 1); Iterator.empty[Ev] }
        .toDF().count())),
      // full group materialization + sort, rules skipped
      ("typed_group_sorted" -> (() => projected.as[Ev].groupByKey(_.userId)
        .flatMapGroups { (_, it) =>
          val s = it.toSeq.sortBy(e => (e.us, e.eventId)); Iterator.single(s.length.toLong) }
        .toDF().count())),
      ("u1_full" -> (() => {
        projected.as[Ev].groupByKey(_.userId)
          .flatMapGroups { (uid, it) => FlagRules.evaluateAll(uid, it.toSeq, asOf) }
          .toDF().count()
      })))

    // warm
    stages.foreach { case (_, f) => f() }
    val medians = stages.map { case (name, f) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> ts(ts.length / 2)
    }
    medians.foreach { case (n, t) => println(f"PROFILE $n%-20s ${t}%8.3f s") }

    val dist = Tables.events(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("users"), avg(col("n")).as("mean"),
        expr("percentile(n, 0.5)").as("p50"), expr("percentile(n, 0.99)").as("p99"),
        max(col("n")).as("max"))
      .head()
    println(s"GROUPDIST users=${dist.getLong(0)} mean=${dist.getDouble(1)} " +
      s"p50=${dist.get(2)} p99=${dist.get(3)} max=${dist.getLong(4)}")
    spark.stop()
  }
}

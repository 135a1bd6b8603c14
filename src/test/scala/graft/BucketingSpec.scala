package graft

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins (SURVEY.md §7 scale strategy): two tables
  * bucketed on the join key must sort-merge WITHOUT a shuffle — the layout
  * that amortizes one shuffle across every future join at warehouse scale. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val sf = "/root/testdata/sf0.001"
  private val base = s"${sys.props("java.io.tmpdir")}/graft_bucketing_spec"

  test("joining two tables bucketed on the key needs no shuffle") {
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$base/orders").saveAsTable("bkt_orders")
    Tables.customer(spark, sf).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$base/customer").saveAsTable("bkt_customer")

    val bucketed = spark.table("bkt_orders")
      .join(spark.table("bkt_customer"), col("o_custkey") === col("c_custkey"))
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")

    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
    assert(bucketed.count() == plain.count())
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}

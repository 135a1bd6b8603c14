package graft

import graft.ops.TimeJoins
import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator must equal the compositional form
  * (equi-join + range + row_number) on random data — including duplicate
  * right times — plan as AsOfJoinExec without a Window, and be
  * partitioning-independent. */
class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data() = {
    val rnd = new scala.util.Random(42)
    // ~50 keys, duplicate right times on purpose (tie-break coverage)
    val left = (1 to 800).map(i =>
      (1000L + i, rnd.nextInt(50).toLong, rnd.nextInt(500).toLong))
    val right = (1 to 900).map(i =>
      (5000L + i, rnd.nextInt(50).toLong, rnd.nextInt(250).toLong * 2))
    (left.toDF("p_id", "p_user", "p_us"), right.toDF("c_id", "c_user", "c_us"))
  }

  test("native as-of equals the compositional window form") {
    val (l, r) = data()
    val native = AsOfJoinPlan.asOfBackward(l, r, "p_user", "p_us", "c_user", "c_us", "c_id")
      .select("p_id", "c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val composed = TimeJoins.asOf(l, r, "p_user", "c_user", "p_us", "c_us", "c_id", "p_id")
      .select("p_id", "c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("forward variant equals the compositional window form") {
    val (l, r) = data()
    val native = AsOfJoinPlan.asOfForward(l, r, "p_user", "p_us", "c_user", "c_us", "c_id")
      .select("p_id", "c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val composed = TimeJoins.asOf(l, r, "p_user", "c_user", "p_us", "c_us", "c_id", "p_id",
        direction = "forward")
      .select("p_id", "c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("outer variant keeps unmatched left rows exactly once, null-extended") {
    val (l, r) = data()
    val inner = AsOfJoinPlan.asOfBackward(l, r, "p_user", "p_us", "c_user", "c_us", "c_id")
      .select("p_id", "c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val outer = AsOfJoinPlan.asOfBackward(l, r, "p_user", "p_us", "c_user", "c_us", "c_id",
        outer = true)
      .select("p_id", "c_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1))))
    // every left row appears exactly once
    assert(outer.length == l.count())
    assert(outer.map(_._1).distinct.length == outer.length)
    // matched rows agree with inner; unmatched are null-extended
    outer.foreach { case (pid, c) =>
      assert(c == inner.get(pid), s"p_id $pid")
    }
    assert(outer.exists(_._2.isEmpty), "test data should contain unmatched left rows")
    // forward-outer: same row-multiplicity law
    val fOuter = AsOfJoinPlan.asOfForward(l, r, "p_user", "p_us", "c_user", "c_us", "c_id",
        outer = true).select("p_id", "c_id").collect()
    assert(fOuter.length == l.count())
  }

  test("outer keeps left rows with null key/time, null-extended") {
    val lNull = Seq((1L, Some(5L), Some(100L)), (2L, None, Some(100L)),
      (3L, Some(5L), None)).toDF("p_id", "p_user", "p_us")
    val r = Seq((10L, 5L, 50L)).toDF("c_id", "c_user", "c_us")
    val out = AsOfJoinPlan.asOfBackward(lNull, r, "p_user", "p_us", "c_user", "c_us", "c_id",
        outer = true)
      .select("p_id", "c_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, -1L), (3L, -1L)),
      s"null-key/time left rows must survive null-extended: $out")
  }

  test("result is independent of input partitioning") {
    val (l, r) = data()
    val a = AsOfJoinPlan.asOfBackward(l.repartition(13), r.repartition(3),
        "p_user", "p_us", "c_user", "c_us", "c_id")
      .select("p_id", "c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val b = AsOfJoinPlan.asOfBackward(l.coalesce(1), r.coalesce(1),
        "p_user", "p_us", "c_user", "c_us", "c_id")
      .select("p_id", "c_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(a == b)
  }

  test("plans as AsOfJoinExec: one shuffle+sort per side, no Window, no pair blowup") {
    val (l, r) = data()
    val plan = AsOfJoinPlan.asOfBackward(l, r, "p_user", "p_us", "c_user", "c_us", "c_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // exec node prints without the Exec suffix
    assert(!plan.contains("Window"))
    assert(!plan.contains("SortMergeJoin"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators (SURVEY.md §2.3 J4/J5/J6/J9).
  *
  * The reference implements each of these as nested Python loops over pandas
  * rows; here each is an equi-join on a blocking key with a range residual, so
  * Spark plans a shuffled hash / sort-merge join on the equi part and evaluates
  * the range predicate as a residual filter — no cross product. That blocking
  * key is the difference between "works on 60k rows" and "works on 100 TB":
  * every operator below requires one and never falls back to a cartesian plan.
  */
object TimeJoins {

  /** J4: point-in-interval join — attach interval rows whose [start,end] spans
    * the probe's point. Equi part: `keys`; residual: containment.
    * Reference: `get_active_memberships_for_date`
    * `/root/reference/data_pipeline/fetch_capitan_membership_data.py:299-312`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      point: Column, start: Column, end: Column, how: String = "inner"): DataFrame =
    points.join(intervals, keys.map(k => points(k) === intervals(k))
      .reduceOption(_ && _).map(_ && point >= start && point <= end)
      .getOrElse(point >= start && point <= end), how)

  /** J5: as-of join — for each left row, the single latest right row (same key)
    * with right time <= left time (backward as-of; `direction = "forward"` for
    * the earliest right row strictly after). Deterministic via `rightTiebreak`.
    * Reference: first-membership-after-pass `pipeline_handler.py:528-556`.
    *
    * Implemented as equi-join + range filter + row_number — Catalyst plans the
    * equi part as a normal shuffled join; the window dedup adds one more
    * shuffle on the same key, which AQE coalesces.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: Column, rightTime: Column, rightTiebreak: Column,
      leftId: Column, direction: String = "backward"): DataFrame = {
    val joined = direction match {
      case "backward" => left.join(right, left(key) === right(key) && rightTime <= leftTime)
      case _          => left.join(right, left(key) === right(key) && rightTime > leftTime)
    }
    val ord = if (direction == "backward") Seq(rightTime.desc, rightTiebreak.asc)
              else Seq(rightTime.asc, rightTiebreak.asc)
    val w = Window.partitionBy(leftId).orderBy(ord: _*)
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J6: time-proximity self-join — pairs of rows within `toleranceSecs` of
    * each other, blocked on `blockKeys` (MUST include a time-bucketable or
    * natural grouping key; the residual only sees same-block candidates).
    * `idA < idB` dedups the symmetric pair.
    * Reference: 5-min family co-checkin `build_family_relationships.py:396-429`,
    * 30-min interaction pairs `build_customer_interactions.py:123-177`.
    */
  def proximityPairs(df: DataFrame, blockKeys: Seq[String], epochSecs: String,
      id: String, toleranceSecs: Long): DataFrame = {
    val a = df.select((blockKeys :+ epochSecs :+ id).map(col): _*).toDF(
      blockKeys.map(k => s"${k}") ++ Seq(s"${epochSecs}_a", s"${id}_a"): _*)
    val b = df.select((blockKeys :+ epochSecs :+ id).map(col): _*).toDF(
      blockKeys.map(k => s"${k}_b") ++ Seq(s"${epochSecs}_b", s"${id}_b"): _*)
    val cond = blockKeys.map(k => a(k) === b(s"${k}_b")).reduce(_ && _) &&
      abs(a(s"${epochSecs}_a") - b(s"${epochSecs}_b")) <= toleranceSecs &&
      a(s"${id}_a") < b(s"${id}_b")
    a.join(b, cond).select(
      (blockKeys.map(a(_)) ++ Seq(a(s"${id}_a"), b(s"${id}_b"), a(s"${epochSecs}_a"), b(s"${epochSecs}_b"))): _*)
  }

  /** J9: amount+date-proximity join — match each probe (e.g. refund) to
    * candidate rows of the same key and same rounded amount within
    * `lookbackSecs` BEFORE the probe; keep the latest candidate
    * (deterministic). Reference: refund→charge linking
    * `link_refunds_to_categories.py:74-150`. */
  def amountDateMatch(probes: DataFrame, candidates: DataFrame, key: String,
      probeAmount: Column, candAmount: Column,
      probeSecs: Column, candSecs: Column, probeId: Column, candTiebreak: Column,
      lookbackSecs: Long): DataFrame = {
    val joined = probes.join(candidates,
      probes(key) === candidates(key) &&
        round(probeAmount, 0) === round(candAmount, 0) &&
        candSecs <= probeSecs && candSecs >= probeSecs - lookbackSecs)
    val w = Window.partitionBy(probeId).orderBy(candSecs.desc, candTiebreak.asc)
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}

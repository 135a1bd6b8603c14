package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, PartitioningCollection}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Native as-of join (SURVEY.md §2.3 J5, §4.2's whole-operator rung:
  * LogicalPlan + Strategy + SparkPlan).
  *
  * For each left row, attach the single right row with the same key and the
  * LATEST right time at-or-before the left time (ties on equal right times
  * broken by the smallest tiebreak value); left rows with no prior right row
  * are dropped (inner semantics — `TimeJoins.asOf(direction="backward")`) or,
  * with `outer = true`, kept with null-extended right columns (left-outer).
  *
  * Why a physical operator: the compositional form (equi-join on key +
  * range filter + row_number window) shuffles the JOINED rows a second time
  * for the window and materializes every (left, earlier-right) candidate
  * pair before discarding all but one — at 100 TB the candidate blowup is
  * quadratic in per-key density. This operator declares the same
  * distribution+ordering a sort-merge join would (one shuffle+sort per
  * side), then streams: a per-partition merge keeps ONE buffered best-match
  * row per key, so the cost is O(|L| + |R|) with no intermediate pairs.
  *
  * Keys, times, and the tiebreak are LongType (the API wrapper casts) —
  * the engine's time axis is epoch micros. Right rows with null
  * key/time/tiebreak are dropped by the wrapper (they can never match);
  * LEFT rows with null key/time flow into the exec, which emits them
  * null-extended (outer) or drops them (inner) — in-operator handling,
  * because a wrapper-side filter + union re-attach replays the whole left
  * subtree once per chained as-of level (cv1's chain: 32 scans vs 5).
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTiebreak: Attribute,
    forward: Boolean, outer: Boolean)
    extends BinaryNode {
  // left-outer semantics: every left row survives, so right columns turn
  // nullable in the joined schema
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin = copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTiebreak: Attribute,
    forward: Boolean, outer: Boolean)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning =
    PartitioningCollection(Seq(left.outputPartitioning))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression seqs; build the (non-serializable)
    // UnsafeProjections inside each partition
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lKeyExprs = Seq[Expression](leftKey, leftTime)
    val rKeyExprs = Seq[Expression](rightKey, rightTime)
    val fwd = forward
    val keepUnmatched = outer
    val nRightCols = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyGen = UnsafeProjection.create(rKeyExprs, rOut)
      val resultProj = UnsafeProjection.create(out, out)
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      // all-null right image for outer no-match emission (values are copied
      // out by resultProj, so one shared instance per partition is safe)
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nRightCols)
      // backward: one buffered best-match per key, reset implicitly on key move
      var bestRow: InternalRow = null
      var bestKey = 0L
      var bestTime = 0L
      var haveBest = false
      lIter.flatMap { lRow =>
        val lk = lKeyGen(lRow)
        // null key/time can never match: outer keeps the row null-extended,
        // inner drops it. Handled HERE rather than by a pre-filter + union
        // re-attach in the API wrapper: that union's second branch replays
        // the whole left subtree, and under chained as-ofs (cv1: three) the
        // replays compound — 32 parquet scans in the static plan vs 5.
        // Nulls sort first (NULLS FIRST ordering), ahead of every real key,
        // and skip the right-cursor advance, so merge state is untouched.
        if (lk.isNullAt(0) || lk.isNullAt(1)) {
          if (keepUnmatched) Iterator.single(resultProj(joined(lRow, nullRight)))
          else Iterator.empty
        } else {
        val k = lk.getLong(0)
        val t = lk.getLong(1)
        // consume right rows that are now or forever behind this left cursor:
        // key < k always; same-key rows with time <= t (useless for any later
        // left row too, since left times ascend)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rk = rKeyGen(rBuf.head)
          val rKeyV = rk.getLong(0)
          val rTimeV = rk.getLong(1)
          if (rKeyV < k || (rKeyV == k && rTimeV <= t)) {
            val row = rBuf.next()
            if (!fwd && rKeyV == k && (!haveBest || bestKey != k || rTimeV > bestTime)) {
              // equal times keep the FIRST row (smallest tiebreak, by ordering)
              bestRow = row.copy()
              bestKey = k
              bestTime = rTimeV
              haveBest = true
            }
          } else advancing = false
        }
        val matched: InternalRow =
          if (fwd) {
            // forward: the match is the right HEAD (earliest time > t, smallest
            // tiebreak) — peeked, not consumed: it may match later left rows too
            if (rBuf.hasNext && rKeyGen(rBuf.head).getLong(0) == k) rBuf.head else null
          } else if (haveBest && bestKey == k) bestRow
          else null
        if (matched != null) Iterator.single(resultProj(joined(lRow, matched)))
        else if (keepUnmatched) Iterator.single(resultProj(joined(lRow, nullRight)))
        else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec = copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** Planner strategy mapping the logical node to the exec. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoin(l, r, lk, lt, rk, rt, tie, fwd, outer) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie, fwd, outer) :: Nil
      case _ => Nil
    }
  }

  /** API: backward (inclusive) as-of join. `leftKey/leftTime` name left
    * columns, `rightKey/rightTime/rightTiebreak` right columns; all are cast
    * to LongType and null-filtered. Output: left columns ++ right columns. */
  def asOfBackward(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, rightTiebreak: String,
      outer: Boolean = false): DataFrame =
    asOf(leftDf, rightDf, leftKey, leftTime, rightKey, rightTime, rightTiebreak,
      forward = false, outer = outer)

  /** Forward variant: the earliest right row strictly AFTER the left time
    * (reference: first membership after pass, `pipeline_handler.py:528-556`). */
  def asOfForward(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, rightTiebreak: String,
      outer: Boolean = false): DataFrame =
    asOf(leftDf, rightDf, leftKey, leftTime, rightKey, rightTime, rightTiebreak,
      forward = true, outer = outer)

  private def asOf(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String, rightTiebreak: String,
      forward: Boolean, outer: Boolean): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    def cast(df: DataFrame, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(LongType)))
    // left-side null key/time rows flow through to the exec, which emits
    // them null-extended (outer) or drops them (inner) — no pre-filter, and
    // crucially no union re-attach whose second branch would replay the
    // whole left subtree once per chained as-of level. Right-side nulls
    // can never match OR be kept, so the cheap na.drop filter stays.
    val l = cast(leftDf, Seq(leftKey, leftTime))
    val r = cast(rightDf, Seq(rightKey, rightTime, rightTiebreak))
      .na.drop(Seq(rightKey, rightTime, rightTiebreak))
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    GraftBridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, leftTime),
      attr(rPlan, rightKey), attr(rPlan, rightTime), attr(rPlan, rightTiebreak),
      forward, outer))
  }
}

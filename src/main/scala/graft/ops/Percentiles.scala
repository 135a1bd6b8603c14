package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT discrete percentiles (percentile_disc semantics: the
  * first data value whose cumulative count reaches ceil(p·n)) without
  * ever buffering a group's values in one aggregator.
  *
  * `percentile_disc` is exact but its Spark implementation collects every
  * value of a group into executor memory — fine at thousands of rows per
  * group, a spill/OOM cliff at 100 TB. This is the t15 band machinery
  * (unigram-surprisal's self-calibrating [p5,p95]) generalized to grouped
  * form:
  *
  *  1. HISTOGRAM: groupBy (group, value) — duplicates collapse, so state
  *     is distinct-value-sized, and the count agg is map-side combinable.
  *  2. TWO-LEVEL PREFIX SUM: coarse value bands give a per-group base
  *     frame of ≤ a few hundred rows (the band running sum is a window
  *     over THAT frame, partitioned by group); the in-band running sum
  *     partitions by (group, band) — no per-group global sort ever
  *     serializes a whole group onto one task.
  *  3. RANK PICK: rank_p = ceil(p·n) in pure integer arithmetic
  *     ((n·num + den−1) div den), then min(value WHERE cum ≥ rank) — both
  *     engines pick the identical element of the identical value set, so
  *     doubles hash-match with no interpolation arithmetic.
  *
  * One core serves both measures: [[disc]] counts rows (weight 1);
  * [[discWeighted]] accumulates an integer weight column — the value at
  * which the running WEIGHT first reaches ceil(p·W).
  *
  * Reference semantics: `membership_stats.py` medians and the SQL-standard
  * WITHIN GROUP (ORDER BY …) discrete percentile.
  */
object Percentiles {

  /** Exact per-group discrete percentiles of `valueCol`.
    *
    * @param fracs  (outputColumn, numerator, denominator) per requested
    *               percentile — p = num/den kept in exact integers.
    * @param band   coarse banding of the value for the two-level prefix
    *               sum; the default (÷100) suits currency-scaled doubles.
    *               Any monotone coarsening is correct — the choice only
    *               tunes the base-frame size.
    * @return one row per group: groupCols ++ (n, min_val, max_val) ++ the
    *         requested percentile columns (value-typed, NULLs excluded as
    *         percentile_disc does).
    */
  def disc(df: DataFrame, groupCols: Seq[String], valueCol: String,
      fracs: Seq[(String, Int, Int)],
      band: Column => Column = v => floor(v / 100).cast("long")): DataFrame =
    rankPick(df.filter(col(valueCol).isNotNull).withColumn("__w", lit(1L)),
      groupCols, valueCol, fracs, band, totalAlias = "n",
      extras = Seq(min(col("__v")).as("min_val"), max(col("__v")).as("max_val")))

  /** WEIGHTED exact discrete percentiles: the value at which the running
    * WEIGHT (not row count) first reaches ceil(p·W) — e.g. the
    * quantity-weighted median price, where a 50-unit line item counts 50×.
    * Weights go through floor-then-cast to BIGINT (ONE fractional-weight
    * semantics across engines: DuckDB CAST(double AS BIGINT) rounds where
    * Spark's cast truncates) and non-positive weights are excluded;
    * integer weights keep the ranks exact — no double accumulation.
    *
    * @return one row per group: groupCols ++ (total_weight) ++ the
    *         requested percentile columns. */
  def discWeighted(df: DataFrame, groupCols: Seq[String], valueCol: String,
      weight: Column, fracs: Seq[(String, Int, Int)],
      band: Column => Column = v => floor(v / 100).cast("long")): DataFrame =
    rankPick(
      df.filter(col(valueCol).isNotNull)
        .withColumn("__w", floor(weight).cast("long"))
        .filter(col("__w").isNotNull && col("__w") > 0),
      groupCols, valueCol, fracs, band, totalAlias = "total_weight",
      extras = Seq.empty)

  /** The shared machinery: `rows` must carry the integer measure column
    * `__w`; emits groupCols ++ (totalAlias ++ extras) ++ fracs picks. */
  private def rankPick(rows: DataFrame, groupCols: Seq[String],
      valueCol: String, fracs: Seq[(String, Int, Int)],
      band: Column => Column, totalAlias: String,
      extras: Seq[Column]): DataFrame = {
    require(fracs.nonEmpty, "at least one percentile fraction required")
    val g = groupCols.map(col)
    val hist = rows
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(sum(col("__w")).as("__hc"))
      .withColumn("__band", band(col("__v")))
    // level 1: running sum over the per-group band frame (bounded rows)
    val bandW = Window.partitionBy(g: _*).orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandTot = hist.groupBy(g :+ col("__band"): _*)
      .agg(sum(col("__hc")).as("__bt"))
      .withColumn("__bprev", coalesce(sum(col("__bt")).over(bandW), lit(0L)))
      .select(g :+ col("__band") :+ col("__bprev"): _*)
    // level 2: in-band running sum, partitioned by (group, band)
    val inBand = Window.partitionBy(g :+ col("__band"): _*).orderBy(col("__v"))
    val cum = hist.join(bandTot, groupCols :+ "__band")
      .withColumn("__cum", col("__bprev") + sum(col("__hc")).over(inBand))
    // integer-ceil ranks off the per-group measure total
    val ranks = fracs.foldLeft(
        rows.groupBy(g: _*).agg(sum(col("__w")).as("__tw"))) {
      case (acc, (nm, num, den)) =>
        acc.withColumn(s"__r_$nm", expr(s"(__tw * $num + ${den - 1}) div $den"))
    }
    val pickCols =
      (max(col("__tw")).as(totalAlias) +: extras) ++
      fracs.map { case (nm, _, _) =>
        min(when(col("__cum") >= col(s"__r_$nm"), col("__v"))).as(nm)
      }
    cum.join(ranks, groupCols)
      .groupBy(g: _*)
      .agg(pickCols.head, pickCols.tail: _*)
  }
}

package graft.queries

import graft.core.Tables
import graft.ops.Normalize
import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** AB1 — experiment results: the A/B-test readout the reference builds from
  * its experiment-entry log.
  *
  * Reference: `experiment_tracking.py:15-213` — `log_experiment_entry`
  * appends (customer, experiment, group, entry_flag, entry_date) rows each
  * pipeline run, silently skipping customers already entered (`:88-96`);
  * `get_experiment_stats` (`:182-213`) reports per-group counts, and
  * `audit_ab_test_system.py:1-539` reads the group comparison (N entered,
  * converters, rate per group).
  *
  * Re-expressed as one declared plan over the event ledger:
  *
  *  - ENTRY: a customer enters an experiment when its entry flag fires for
  *    them on a pipeline run — here the u1 rules engine evaluated at two
  *    run clocks (2024-01-10, 2024-01-20), i.e. two entry cohorts. The
  *    un-gated flags serve as entry triggers (`returning_offer_2wk` embeds
  *    its own A-half hash gate, so it is the treatment arm of cv1, not an
  *    entry trigger): `inactive_24h` → winback, `active_member` → member
  *    retention.
  *  - DEDUP: first-entry-wins per (customer, experiment) — the reference's
  *    duplicate-entry skip — as a min-over-clocks aggregate, not a scan of
  *    an accumulating CSV.
  *  - GROUP: the m5 md5 split on the customer id (`customer_flags_config
  *    .py:58-132`'s deterministic assignment), A = buckets 0–4.
  *  - CONVERSION: first 'purchase' strictly after the entry clock, via the
  *    native forward as-of join (entry clocks differ per cohort, so this
  *    is a genuine as-of merge, not a constant filter); 7-day window +
  *    ever, rate per group, mean days-to-conversion over converters.
  *
  * Scale shape: each flag evaluation is one aggregate pass over events;
  * entries shuffle once on the customer key, the as-of merge and the final
  * rollup ride the same partitioning; output is experiments × groups — a
  * handful of rows regardless of corpus size. No driver state, no
  * accumulating file.
  */
object Experiments {

  private val DayUs = 86400000000L

  /** The two pipeline-run clocks that log entry cohorts. */
  private val entryClocks = Seq(
    1704844800000000L, // 2024-01-10T00:00:00Z
    1705708800000000L) // 2024-01-20T00:00:00Z

  private val entryFlags = Seq("inactive_24h", "active_member")

  private def experimentOf(flag: org.apache.spark.sql.Column) =
    when(flag === "inactive_24h", "winback_2024_01")
      .otherwise("member_retention_2024_01")

  /** The deduped entry ledger: (user_id, entry_flag, entry_us,
    * experiment_id, ab_group). */
  private[queries] def entries(s: SparkSession, d: String): DataFrame = {
    val perClock = entryClocks.map { c =>
      FlagQs.flagsAt(s, d, c)
        .filter(col("flag_type").isin(entryFlags: _*))
        .select(col("user_id"), col("flag_type").as("entry_flag"),
          lit(c).as("entry_us"))
    }
    perClock.reduce(_ unionByName _)
      .groupBy(col("user_id"), col("entry_flag"))
      .agg(min(col("entry_us")).as("entry_us"))
      .withColumn("experiment_id", experimentOf(col("entry_flag")))
      .withColumn("ab_group",
        when(Normalize.abGroup(col("user_id").cast("string")) <= 4, "A")
          .otherwise("B"))
  }

  val qs: Seq[Q] = Seq(
    Q("ab1_experiment_results",
      (s, d) => {
        val e = entries(s, d)
        val purchases = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), Q.usecs(col("ts")).as("p_us"),
            col("event_id").as("p_id"))
        val j = AsOfJoinPlan.asOfForward(e, purchases,
          "user_id", "entry_us", "p_user", "p_us", "p_id", outer = true)
        val dDays = ((col("p_us") - col("entry_us")) / lit(DayUs)).cast("long")
        j.groupBy(col("experiment_id"), col("ab_group"), col("entry_flag"))
          .agg(
            count(lit(1)).as("n_entered"),
            sum(when(col("p_us").isNotNull && dDays <= 7, 1L).otherwise(0L))
              .as("n_converted_7d"),
            sum(when(col("p_us").isNotNull, 1L).otherwise(0L))
              .as("n_converted_ever"),
            // decimal SUM (order-independent), DOUBLE division at the end —
            // decimal division scale/rounding is engine-specific (the k2b
            // lesson), so Q.davg's decimal-divide can't be used here
            (sum(when(col("p_us").isNotNull, dDays).cast(DecimalType(18, 4)))
              .cast("double") /
              count(when(col("p_us").isNotNull, dDays)))
              .as("avg_days_to_conversion"))
          .withColumn("conversion_rate_7d",
            round(col("n_converted_7d").cast("double") * 100.0 /
              col("n_entered").cast("double"), 2))
          .select(col("experiment_id"), col("ab_group"), col("entry_flag"),
            col("n_entered"), col("n_converted_7d"), col("n_converted_ever"),
            col("conversion_rate_7d"), col("avg_days_to_conversion"))
      },
      Some {
        val ab = Normalize.abGroupSql("CAST(user_id AS VARCHAR)")
        val flagsIn = entryFlags.map(f => s"'$f'").mkString(", ")
        val cohorts = entryClocks.zipWithIndex.map { case (c, i) =>
          s"""co$i AS (
             |  SELECT user_id, flag_type AS entry_flag,
             |    CAST($c AS BIGINT) AS entry_us
             |  FROM (${FlagQs.flagsSql(c)})
             |  WHERE flag_type IN ($flagsIn))""".stripMargin
        }.mkString(",\n")
        val uni = entryClocks.indices.map(i => s"SELECT * FROM co$i")
          .mkString("\nUNION ALL\n")
        s"""WITH $cohorts,
           |uni AS ($uni),
           |e AS (
           |  SELECT user_id, entry_flag, MIN(entry_us) AS entry_us,
           |    CASE WHEN entry_flag = 'inactive_24h' THEN 'winback_2024_01'
           |      ELSE 'member_retention_2024_01' END AS experiment_id,
           |    CASE WHEN $ab <= 4 THEN 'A' ELSE 'B' END AS ab_group
           |  FROM uni GROUP BY user_id, entry_flag),
           |c AS (
           |  SELECT * FROM (
           |    SELECT e.*, p.p_us FROM e
           |    LEFT JOIN (SELECT user_id AS p_user, epoch_us(ts) AS p_us,
           |                 event_id AS p_id
           |               FROM events WHERE event_type = 'purchase') p
           |      ON e.user_id = p.p_user AND p.p_us > e.entry_us
           |    QUALIFY row_number() OVER (PARTITION BY e.user_id, e.entry_flag
           |      ORDER BY p.p_us, p.p_id) = 1))
           |SELECT experiment_id, ab_group, entry_flag,
           |  CAST(COUNT(*) AS BIGINT) AS n_entered,
           |  CAST(COUNT(*) FILTER (WHERE p_us IS NOT NULL
           |    AND (p_us - entry_us) // $DayUs <= 7) AS BIGINT) AS n_converted_7d,
           |  CAST(COUNT(*) FILTER (WHERE p_us IS NOT NULL) AS BIGINT)
           |    AS n_converted_ever,
           |  round(COUNT(*) FILTER (WHERE p_us IS NOT NULL
           |      AND (p_us - entry_us) // $DayUs <= 7) * 100.0 / COUNT(*), 2)
           |    AS conversion_rate_7d,
           |  CAST(SUM(CAST((CASE WHEN p_us IS NOT NULL
           |      THEN (p_us - entry_us) // $DayUs END) AS DECIMAL(18,4))) AS DOUBLE)
           |    / COUNT(CASE WHEN p_us IS NOT NULL
           |      THEN (p_us - entry_us) // $DayUs END)
           |    AS avg_days_to_conversion
           |FROM c GROUP BY 1, 2, 3""".stripMargin
      })
  )
}

package graft.queries

import graft.core.Tables
import graft.ops.Normalize
import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CV1/CV2 — the conversion funnel: per-visit enriched day-pass table, then
  * the cohort rollup chained FROM it, as the reference ships them
  * (`build_conversion_rate_analysis.py:45-432`).
  *
  * The reference enriches each visit in a driver loop over dict lookups
  * (`:156-300`): skip visits covered by a membership period, number the
  * rest, 60-day rolling ordinal, then compare against the customer's first
  * 2-week pass / first full membership. Re-expressed distributed:
  *
  *  - day-pass visit = 'view' event; 2-week pass = 'signup'; full
  *    membership = 'purchase' (j5's event-ledger convention — orders live on
  *    a different clock than events, so membership signals come from the
  *    event stream).
  *  - 60-day rolling ordinal (`:208-216`): RANGE window over the UNFILTERED
  *    visit stream (the reference builds `customer_visits` before the
  *    member-skip), strict lower bound — (60d−1µs) PRECEDING.
  *  - member-at-visit skip (`:187-200`): native backward as-of join
  *    (AsOfJoinExec) to the latest membership engagement at-or-before the
  *    visit; covered = within its 30-day period. One merge, no explode.
  *  - all-time visit_number (`:202-206`): row_number over SURVIVING visits
  *    (the reference increments its counter after the skip).
  *  - conversion (`:231-260`): native FORWARD as-of to the first 2wk /
  *    first full membership strictly after the visit, then the
  *    7/30/60/90-day booleans off integer day gaps. (The reference compares
  *    against the first-EVER membership; post-period re-engagements differ —
  *    the forward as-of is the order-independent distributed form, and the
  *    oracle mirrors it exactly.)
  *  - ab_group (`:218-229`): m5's md5 split; treatment_flag (`:88-105`):
  *    the 2wk offer row from the u1 flag-rules run, broadcast.
  *
  * Scale shape: events shuffle once per derived stream on the user key; the
  * two window passes and three as-of merges all run on that same hash
  * partitioning; the only broadcast is the flag-sized offer dim. CV2 is one
  * hash aggregate over CV1's output — cohort keys are month × category, so
  * the rollup is bounded regardless of corpus size.
  */
object ConversionFunnel {

  private val DayUs = 86400000000L

  /** The enriched-visits plan, shared by cv1 (declared) and cv2 (chained). */
  private[queries] def enrichedVisits(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("visit_id"),
        Q.usecs(col("ts")).as("v_us"))
    // 60d rolling ordinal over ALL visits (strict lower bound)
    val w60 = Window.partitionBy(col("user_id")).orderBy(col("v_us"))
      .rangeBetween(-(60L * DayUs - 1), 0)
    val with60 = views.withColumn("visit_num_60d", count(lit(1)).over(w60))

    // latest membership engagement at-or-before the visit; drop covered rows
    val mems = ev.filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id").as("m_user"), Q.usecs(col("ts")).as("m_us"),
        col("event_id").as("m_id"))
    val nonMember = AsOfJoinPlan.asOfBackward(with60, mems,
        "user_id", "v_us", "m_user", "m_us", "m_id", outer = true)
      .filter(col("m_us").isNull || col("v_us") - col("m_us") > 30L * DayUs)
      .drop("m_user", "m_us", "m_id")

    val wNum = Window.partitionBy(col("user_id")).orderBy(col("v_us"), col("visit_id"))
    val numbered = nonMember.withColumn("visit_number", row_number().over(wNum))

    // first 2wk pass / full membership strictly after the visit
    val twoWk = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("w_user"), Q.usecs(col("ts")).as("w_us"),
        col("event_id").as("w_id"))
    val fullM = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("f_user"), Q.usecs(col("ts")).as("f_us"),
        col("event_id").as("f_id"))
    val joined = AsOfJoinPlan.asOfForward(
        AsOfJoinPlan.asOfForward(numbered, twoWk,
          "user_id", "v_us", "w_user", "w_us", "w_id", outer = true)
          .drop("w_user", "w_id"),
        fullM, "user_id", "v_us", "f_user", "f_us", "f_id", outer = true)
      .drop("f_user", "f_id")

    // treatment flag: the 2wk offer row from the flag-rules run (tiny dim)
    val offers = FlagQs.flagsAt(s, d, FlagQs.asOfUs)
      .filter(col("flag_type") === "returning_offer_2wk")
      .select(col("user_id").as("t_user"), col("flag_type").as("treatment_flag"))

    val d2wk = ((col("w_us") - col("v_us")) / lit(DayUs)).cast("long")
    val dMem = ((col("f_us") - col("v_us")) / lit(DayUs)).cast("long")
    def within(dayGap: Column, n: Int): Column = coalesce(dayGap <= n, lit(false))

    joined.join(broadcast(offers), col("user_id") === col("t_user"), "left")
      .select(
        col("visit_id"), col("user_id").as("customer_id"),
        Q.tsFmt(timestamp_micros(col("v_us"))).as("visit_ts"),
        to_date(timestamp_micros(col("v_us"))).as("visit_date"),
        date_format(timestamp_micros(col("v_us")), "yyyy-MM").as("cohort_month"),
        col("visit_number"), col("visit_num_60d"),
        when(col("visit_num_60d") >= 3, "3+")
          .otherwise(col("visit_num_60d").cast("string")).as("visit_category_60d"),
        when(Normalize.abGroup(col("user_id").cast("string")) <= 4, "A")
          .otherwise("B").as("ab_group"),
        col("treatment_flag"),
        within(d2wk, 7).as("converted_2wk_7d"),
        within(d2wk, 30).as("converted_2wk_30d"),
        within(d2wk, 60).as("converted_2wk_60d"),
        col("w_us").isNotNull.as("converted_2wk_ever"),
        d2wk.as("days_to_2wk"),
        Q.tsFmt(timestamp_micros(col("w_us"))).as("conversion_2wk_ts"),
        within(dMem, 7).as("converted_member_7d"),
        within(dMem, 30).as("converted_member_30d"),
        within(dMem, 60).as("converted_member_60d"),
        within(dMem, 90).as("converted_member_90d"),
        col("f_us").isNotNull.as("converted_member_ever"),
        dMem.as("days_to_member"),
        Q.tsFmt(timestamp_micros(col("f_us"))).as("conversion_member_ts"),
        (col("w_us").isNotNull || col("f_us").isNotNull).as("converted"),
        coalesce(d2wk, dMem).as("days_to_conversion"))
  }

  /** Oracle-side enriched visits, shared by both queries' SQL. */
  private def enrichedSql: String = {
    val ab = Normalize.abGroupSql("CAST(user_id AS VARCHAR)")
    s"""views AS (
       |  SELECT user_id, event_id AS visit_id, epoch_us(ts) AS v_us,
       |    COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
       |      RANGE BETWEEN ${60L * DayUs - 1} PRECEDING AND CURRENT ROW)
       |      AS visit_num_60d
       |  FROM events WHERE event_type = 'view'),
       |nonmem AS (
       |  SELECT * FROM (
       |    SELECT v.*, m.m_us FROM views v
       |    LEFT JOIN (SELECT user_id AS m_user, epoch_us(ts) AS m_us,
       |                 event_id AS m_id
       |               FROM events WHERE event_type IN ('signup', 'purchase')) m
       |      ON v.user_id = m.m_user AND m.m_us <= v.v_us
       |    QUALIFY row_number() OVER (PARTITION BY v.visit_id
       |      ORDER BY m.m_us DESC, m.m_id) = 1)
       |  WHERE m_us IS NULL OR v_us - m_us > ${30L * DayUs}),
       |numbered AS (
       |  SELECT user_id, visit_id, v_us, visit_num_60d,
       |    row_number() OVER (PARTITION BY user_id ORDER BY v_us, visit_id)
       |      AS visit_number
       |  FROM nonmem),
       |w2 AS (
       |  SELECT * FROM (
       |    SELECT n.*, s.w_us FROM numbered n
       |    LEFT JOIN (SELECT user_id AS w_user, epoch_us(ts) AS w_us,
       |                 event_id AS w_id
       |               FROM events WHERE event_type = 'signup') s
       |      ON n.user_id = s.w_user AND s.w_us > n.v_us
       |    QUALIFY row_number() OVER (PARTITION BY n.visit_id
       |      ORDER BY s.w_us, s.w_id) = 1)),
       |fm AS (
       |  SELECT * FROM (
       |    SELECT w.*, f.f_us FROM w2 w
       |    LEFT JOIN (SELECT user_id AS f_user, epoch_us(ts) AS f_us,
       |                 event_id AS f_id
       |               FROM events WHERE event_type = 'purchase') f
       |      ON w.user_id = f.f_user AND f.f_us > w.v_us
       |    QUALIFY row_number() OVER (PARTITION BY w.visit_id
       |      ORDER BY f.f_us, f.f_id) = 1)),
       |offers AS (
       |  SELECT user_id AS t_user, flag_type AS treatment_flag
       |  FROM (${FlagQs.flagsSql(FlagQs.asOfUs)})
       |  WHERE flag_type = 'returning_offer_2wk'),
       |enriched AS (
       |  SELECT visit_id, user_id AS customer_id,
       |    ${Q.tsFmtSql("make_timestamp(v_us)")} AS visit_ts,
       |    CAST(make_timestamp(v_us) AS DATE) AS visit_date,
       |    strftime(make_timestamp(v_us), '%Y-%m') AS cohort_month,
       |    visit_number, visit_num_60d,
       |    CASE WHEN visit_num_60d >= 3 THEN '3+'
       |      ELSE CAST(visit_num_60d AS VARCHAR) END AS visit_category_60d,
       |    CASE WHEN $ab <= 4 THEN 'A' ELSE 'B' END AS ab_group,
       |    treatment_flag,
       |    COALESCE((w_us - v_us) // $DayUs <= 7, false) AS converted_2wk_7d,
       |    COALESCE((w_us - v_us) // $DayUs <= 30, false) AS converted_2wk_30d,
       |    COALESCE((w_us - v_us) // $DayUs <= 60, false) AS converted_2wk_60d,
       |    w_us IS NOT NULL AS converted_2wk_ever,
       |    (w_us - v_us) // $DayUs AS days_to_2wk,
       |    ${Q.tsFmtSql("make_timestamp(w_us)")} AS conversion_2wk_ts,
       |    COALESCE((f_us - v_us) // $DayUs <= 7, false) AS converted_member_7d,
       |    COALESCE((f_us - v_us) // $DayUs <= 30, false) AS converted_member_30d,
       |    COALESCE((f_us - v_us) // $DayUs <= 60, false) AS converted_member_60d,
       |    COALESCE((f_us - v_us) // $DayUs <= 90, false) AS converted_member_90d,
       |    f_us IS NOT NULL AS converted_member_ever,
       |    (f_us - v_us) // $DayUs AS days_to_member,
       |    ${Q.tsFmtSql("make_timestamp(f_us)")} AS conversion_member_ts,
       |    w_us IS NOT NULL OR f_us IS NOT NULL AS converted,
       |    COALESCE((w_us - v_us) // $DayUs, (f_us - v_us) // $DayUs)
       |      AS days_to_conversion
       |  FROM fm LEFT JOIN offers ON user_id = t_user)""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("cv1_enriched_visits",
      (s, d) => enrichedVisits(s, d),
      Some(s"WITH $enrichedSql SELECT * FROM enriched"),
      bench = true),

    // CV2: the cohort rollup CHAINED from cv1's plan — conversion rates by
    // cohort month × 60d visit category (`build_conversion_rate_analysis.py:
    // 327-432`; all windows are complete at the evaluation clock, so the
    // reference's window-maturity nulling never triggers). Rates divide
    // exact integer counts in double and round once, per entry and per
    // unique customer.
    Q("cv2_conversion_cohorts",
      (s, d) => {
        def rate(n: Column, den: Column): Column =
          round(n.cast("double") * 100.0 / den.cast("double"), 2)
        val e = enrichedVisits(s, d)
        val g = e.groupBy(col("cohort_month"), col("visit_category_60d"))
          .agg(
            count(lit(1)).as("total_entries"),
            countDistinct(col("customer_id")).as("unique_customers"),
            sum(when(col("converted_2wk_30d"), 1L).otherwise(0L))
              .as("converted_2wk_30d_entries"),
            countDistinct(when(col("converted_2wk_30d"), col("customer_id")))
              .as("converted_2wk_30d_customers"),
            sum(when(col("converted_member_30d"), 1L).otherwise(0L))
              .as("converted_member_30d_entries"),
            countDistinct(when(col("converted_member_30d"), col("customer_id")))
              .as("converted_member_30d_customers"),
            sum(when(col("converted_member_90d"), 1L).otherwise(0L))
              .as("converted_member_90d_entries"),
            countDistinct(when(col("converted_member_90d"), col("customer_id")))
              .as("converted_member_90d_customers"))
        g.select(col("cohort_month"), col("visit_category_60d"),
          col("total_entries"), col("unique_customers"),
          col("converted_2wk_30d_entries"), col("converted_2wk_30d_customers"),
          col("converted_member_30d_entries"), col("converted_member_30d_customers"),
          col("converted_member_90d_entries"), col("converted_member_90d_customers"),
          rate(col("converted_2wk_30d_entries"), col("total_entries"))
            .as("rate_2wk_30d_by_entry"),
          rate(col("converted_2wk_30d_customers"), col("unique_customers"))
            .as("rate_2wk_30d_by_customer"),
          rate(col("converted_member_30d_entries"), col("total_entries"))
            .as("rate_member_30d_by_entry"),
          rate(col("converted_member_30d_customers"), col("unique_customers"))
            .as("rate_member_30d_by_customer"))
      },
      Some(s"""WITH $enrichedSql
              |SELECT cohort_month, visit_category_60d,
              |  CAST(COUNT(*) AS BIGINT) AS total_entries,
              |  CAST(COUNT(DISTINCT customer_id) AS BIGINT) AS unique_customers,
              |  CAST(COUNT(*) FILTER (WHERE converted_2wk_30d) AS BIGINT)
              |    AS converted_2wk_30d_entries,
              |  CAST(COUNT(DISTINCT customer_id) FILTER (WHERE converted_2wk_30d)
              |    AS BIGINT) AS converted_2wk_30d_customers,
              |  CAST(COUNT(*) FILTER (WHERE converted_member_30d) AS BIGINT)
              |    AS converted_member_30d_entries,
              |  CAST(COUNT(DISTINCT customer_id) FILTER (WHERE converted_member_30d)
              |    AS BIGINT) AS converted_member_30d_customers,
              |  CAST(COUNT(*) FILTER (WHERE converted_member_90d) AS BIGINT)
              |    AS converted_member_90d_entries,
              |  CAST(COUNT(DISTINCT customer_id) FILTER (WHERE converted_member_90d)
              |    AS BIGINT) AS converted_member_90d_customers,
              |  round(COUNT(*) FILTER (WHERE converted_2wk_30d) * 100.0
              |    / COUNT(*), 2) AS rate_2wk_30d_by_entry,
              |  round(COUNT(DISTINCT customer_id) FILTER (WHERE converted_2wk_30d) * 100.0
              |    / COUNT(DISTINCT customer_id), 2) AS rate_2wk_30d_by_customer,
              |  round(COUNT(*) FILTER (WHERE converted_member_30d) * 100.0
              |    / COUNT(*), 2) AS rate_member_30d_by_entry,
              |  round(COUNT(DISTINCT customer_id) FILTER (WHERE converted_member_30d) * 100.0
              |    / COUNT(DISTINCT customer_id), 2) AS rate_member_30d_by_customer
              |FROM enriched
              |GROUP BY cohort_month, visit_category_60d""".stripMargin))
  )
}

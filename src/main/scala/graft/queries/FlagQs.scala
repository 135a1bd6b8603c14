package graft.queries

import graft.core.Tables
import graft.flags.{Ev, FlagRules}
import org.apache.spark.sql.functions._

/** Flag-rule evaluation (SURVEY.md §2.9 U1) — typed
  * `groupByKey.flatMapGroups` over per-user event timelines, with a relational
  * oracle proving the procedural rules compute exactly what they claim. */
object FlagQs {

  /** Evaluation clock: 2024-01-31T00:00:00Z (data ends 2024-01-30). */
  private val asOfUs = 1706659200000000L

  val qs: Seq[Q] = Seq(
    Q("u1_flag_rules",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            Q.usecs(col("ts")).as("us"), col("value"))
          .toDF("userId", "eventId", "eventType", "us", "value")
          .as[Ev]
          .groupByKey(_.userId)
          .flatMapGroups { (uid, it) => FlagRules.evaluateAll(uid, it.toSeq, asOfUs) }
          .toDF()
      },
      Some(s"""WITH per_user AS (
              |  SELECT user_id,
              |    MAX(epoch_us(ts)) AS last_us,
              |    SUM(CASE WHEN epoch_us(ts) >= $asOfUs - 2592000000000 AND epoch_us(ts) < $asOfUs
              |        THEN 1 ELSE 0 END) AS n_30d,
              |    SUM(CASE WHEN event_type = 'purchase' AND epoch_us(ts) >= $asOfUs - 2592000000000
              |             AND epoch_us(ts) < $asOfUs
              |        THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS spend_30d,
              |    SUM(CASE WHEN event_type = 'error' AND epoch_us(ts) >= $asOfUs - 2592000000000
              |             AND epoch_us(ts) < $asOfUs THEN 1 ELSE 0 END) AS err_30d
              |  FROM events GROUP BY user_id)
              |SELECT user_id, 'inactive_24h' AS flag_type,
              |  'hours_since_last=' || (($asOfUs - last_us) // 3600000000) AS flag_data
              |FROM per_user WHERE last_us < $asOfUs - 86400000000
              |UNION ALL
              |SELECT user_id, 'power_user', 'n_30d=' || n_30d
              |FROM per_user WHERE n_30d >= 80
              |UNION ALL
              |SELECT user_id, 'big_spender',
              |  'spend_30d_cents=' || CAST(spend_30d * 100 AS BIGINT)
              |FROM per_user WHERE spend_30d * 100 >= 80000
              |UNION ALL
              |SELECT user_id, 'error_prone', 'err_30d=' || err_30d || ',total_30d=' || n_30d
              |FROM per_user WHERE err_30d >= 20 AND err_30d * 4 >= n_30d""".stripMargin),
      bench = true)
  )
}

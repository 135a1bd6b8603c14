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

  /** Earlier clock for the lifecycle query: 2024-01-15T00:00:00Z. */
  private val asOf1Us = 1705276800000000L

  /** Oracle-side per-user flag evaluation at a parameterized clock —
    * mirrors `FlagRules.active` exactly (shared by u1 and u1b). */
  private def flagsSql(asOf: Long): String =
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN epoch_us(ts) < $asOf THEN epoch_us(ts) END) AS last_us,
       |    SUM(CASE WHEN epoch_us(ts) >= $asOf - 2592000000000 AND epoch_us(ts) < $asOf
       |        THEN 1 ELSE 0 END) AS n_30d,
       |    SUM(CASE WHEN event_type = 'purchase' AND epoch_us(ts) >= $asOf - 2592000000000
       |             AND epoch_us(ts) < $asOf
       |        THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS spend_30d,
       |    SUM(CASE WHEN event_type = 'error' AND epoch_us(ts) >= $asOf - 2592000000000
       |             AND epoch_us(ts) < $asOf THEN 1 ELSE 0 END) AS err_30d,
       |    COUNT(DISTINCT CASE WHEN epoch_us(ts) >= $asOf - 604800000000 AND epoch_us(ts) < $asOf
       |        THEN epoch_us(ts) // 86400000000 END) AS active_days_7d,
       |    SUM(CASE WHEN epoch_us(ts) >= $asOf - 2592000000000 AND epoch_us(ts) < $asOf
       |             AND (epoch_us(ts) // 3600000000) % 24 < 6 THEN 1 ELSE 0 END) AS night_30d,
       |    SUM(CASE WHEN epoch_us(ts) >= $asOf - 2592000000000 AND epoch_us(ts) < $asOf
       |             AND ((epoch_us(ts) // 86400000000 + 4) % 7) IN (0, 6)
       |        THEN 1 ELSE 0 END) AS wkd_30d
       |  FROM events GROUP BY user_id)
       |SELECT user_id, 'inactive_24h' AS flag_type,
       |  'hours_since_last=' || (($asOf - last_us) // 3600000000) AS flag_data
       |FROM per_user WHERE last_us < $asOf - 86400000000
       |UNION ALL
       |SELECT user_id, 'power_user', 'n_30d=' || n_30d
       |FROM per_user WHERE n_30d >= 80
       |UNION ALL
       |SELECT user_id, 'big_spender',
       |  'spend_30d_cents=' || CAST(spend_30d * 100 AS BIGINT)
       |FROM per_user WHERE spend_30d * 100 >= 80000
       |UNION ALL
       |SELECT user_id, 'error_prone', 'err_30d=' || err_30d || ',total_30d=' || n_30d
       |FROM per_user WHERE err_30d >= 10 AND err_30d * 4 >= n_30d
       |UNION ALL
       |SELECT user_id, 'streak_7d', 'active_days=7'
       |FROM per_user WHERE active_days_7d = 7
       |UNION ALL
       |SELECT user_id, 'night_owl', 'night_30d=' || night_30d || ',total_30d=' || n_30d
       |FROM per_user WHERE n_30d >= 20 AND night_30d * 10 >= n_30d * 3
       |UNION ALL
       |SELECT user_id, 'weekend_warrior', 'weekend_30d=' || wkd_30d || ',total_30d=' || n_30d
       |FROM per_user WHERE n_30d >= 20 AND wkd_30d * 100 >= n_30d * 35""".stripMargin

  /** Typed per-user evaluation at a clock (events strictly before it). */
  private def flagsAt(s: org.apache.spark.sql.SparkSession, d: String, asOf: Long)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .filter(Q.usecs(col("ts")) < asOf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Q.usecs(col("ts")).as("us"), col("value"))
      .toDF("userId", "eventId", "eventType", "us", "value")
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroups { (uid, it) => FlagRules.evaluateAll(uid, it.toSeq, asOf) }
      .toDF()
  }

  private val ttlUs = 14L * 86400L * 1000000L

  /** Persistent (never-expiring) flag types — reference
    * `customer_flags_config.py:22-42`. error_prone is the one whose
    * qualification can lapse between runs (a spend window at the later clock
    * SUPERSETS the earlier one, so big_spender can never lapse here). */
  private val persistentFlags = Seq("error_prone")

  val qs: Seq[Q] = Seq(
    Q("u1_flag_rules",
      (s, d) => flagsAt(s, d, asOfUs),
      Some(flagsSql(asOfUs)),
      bench = true),

    // U1b: the flag LIFECYCLE — two evaluation runs merged keep-newest per
    // (user, flag_type), then 14-day TTL expiry with persistent-type carve-out.
    // Reference: merge keep-most-recent `customer_flags_engine.py:666-698`,
    // TTL `:362-408`, persistent types `customer_flags_config.py:22-42`.
    Q("u1b_flag_lifecycle",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val merged = flagsAt(s, d, asOf1Us).withColumn("added_us", lit(asOf1Us))
          .unionByName(flagsAt(s, d, asOfUs).withColumn("added_us", lit(asOfUs)))
        val w = Window.partitionBy(col("user_id"), col("flag_type"))
          .orderBy(col("added_us").desc)
        merged.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
          .filter(col("added_us") >= asOfUs - ttlUs ||
            col("flag_type").isin(persistentFlags: _*))
          .select(col("user_id"), col("flag_type"), col("flag_data"),
            date_format(timestamp_micros(col("added_us")), "yyyy-MM-dd").as("flag_added"))
      },
      Some(s"""WITH old_f AS (
              |  SELECT *, $asOf1Us AS added_us FROM (${flagsSql(asOf1Us)})),
              |new_f AS (
              |  SELECT *, $asOfUs AS added_us FROM (${flagsSql(asOfUs)})),
              |merged AS (SELECT * FROM old_f UNION ALL SELECT * FROM new_f),
              |kept AS (
              |  SELECT * FROM merged
              |  QUALIFY row_number() OVER (PARTITION BY user_id, flag_type
              |    ORDER BY added_us DESC) = 1)
              |SELECT user_id, flag_type, flag_data,
              |  strftime(make_timestamp(added_us), '%Y-%m-%d') AS flag_added
              |FROM kept
              |WHERE added_us >= ${asOfUs - ttlUs}
              |   OR flag_type IN (${persistentFlags.map(f => s"'$f'").mkString(", ")})""".stripMargin))
  )
}

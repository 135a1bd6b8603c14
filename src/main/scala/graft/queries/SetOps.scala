package graft.queries

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts / dedup / unions / set ops / range splice (SURVEY.md §2.6 O1–O5). */
object SetOps {

  val qs: Seq[Q] = Seq(

    // O2: schema-aligned union with null-fill for missing columns —
    // pandas `pd.concat` semantics. Reference: `pipeline_handler.py:268-273`.
    Q("o2_union_align",
      (s, d) => {
        val purchases = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(concat(lit("ev_"), col("event_id")).as("row_id"),
            col("user_id").as("actor"), col("value").as("amount"),
            lit("event_purchase").as("kind"))
        val orders = Tables.orders(s, d)
          .select(concat(lit("ord_"), col("o_orderkey")).as("row_id"),
            col("o_custkey").as("actor"), col("o_totalprice").as("amount"),
            lit("order").as("kind"), col("o_orderpriority").as("priority"))
        purchases.unionByName(orders, allowMissingColumns = true)
      },
      Some("""SELECT 'ev_' || event_id AS row_id, user_id AS actor, value AS amount,
             |       'event_purchase' AS kind, CAST(NULL AS VARCHAR) AS priority
             |FROM events WHERE event_type = 'purchase'
             |UNION ALL
             |SELECT 'ord_' || o_orderkey AS row_id, o_custkey AS actor, o_totalprice AS amount,
             |       'order' AS kind, o_orderpriority AS priority
             |FROM orders""".stripMargin)),

    // O3: dedup by key keep-first (arrival order = (ts, event_id)).
    // Reference: `drop_duplicates(subset=['transaction_id'], keep='first')`
    // `pipeline_handler.py:331,411,463`.
    Q("o3_dedup_keepfirst",
      (s, d) => {
        val keyed = Tables.events(s, d).withColumn("txn_key", (col("event_id") / 4).cast("long"))
        val w = Window.partitionBy(col("txn_key")).orderBy(Q.usecs(col("ts")), col("event_id"))
        keyed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("txn_key"), col("event_id").as("kept_event_id"),
            col("event_type").as("kept_type"))
      },
      Some("""SELECT txn_key, event_id AS kept_event_id, event_type AS kept_type FROM (
             |  SELECT *, event_id // 4 AS txn_key FROM events)
             |QUALIFY row_number() OVER (PARTITION BY txn_key ORDER BY epoch_us(ts), event_id) = 1""".stripMargin)),

    // O4: set difference — keys present on one side only.
    // Reference: `set(recent) - active_ids` `build_customer_master.py:314`.
    Q("o4_set_diff",
      (s, d) => Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
        .except(Tables.events(s, d).select(col("user_id").as("k")).distinct()),
      Some("""SELECT DISTINCT o_custkey AS k FROM orders
             |EXCEPT
             |SELECT DISTINCT user_id AS k FROM events""".stripMargin)),

    // O5: range replacement — keep rows outside [start,end], splice in a
    // corrected slice for the range. Reference: `pipeline_handler.py:366-426`.
    // §7.4 skew mitigation, oracle-gated: the hot-key salted join (scatter
    // the big side over salt sub-keys, replicate the small side) must equal
    // the plain equi-join — the oracle IS the plain join.
    Q("sk1_salted_hot_join",
      (s, d) => {
        val dim = Tables.events(s, d).select(col("event_type").as("et")).distinct()
          .withColumn("type_code", substring(upper(col("et")), 1, 3))
        graft.ops.Skew.saltedJoin(Tables.events(s, d), dim, "event_type", "et", 8)
          .groupBy(col("type_code"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total_value"))
      },
      Some(s"""WITH dim AS (
              |  SELECT DISTINCT event_type AS et, substr(upper(event_type), 1, 3) AS type_code
              |  FROM events)
              |SELECT type_code, COUNT(*) AS n, ${Q.dsumSql("value")} AS total_value
              |FROM events JOIN dim ON event_type = et
              |GROUP BY type_code""".stripMargin)),

    Q("o5_range_splice",
      (s, d) => {
        val o = Tables.orders(s, d)
        val lo = lit("1997-01-01").cast("timestamp")
        val hi = lit("1998-01-01").cast("timestamp")
        val outside = o.filter(col("o_orderdate") < lo || col("o_orderdate") >= hi)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
            col("o_totalprice").as("price"), lit("kept").as("provenance"))
        val corrected = o.filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
            (col("o_totalprice") * 2).as("price"), lit("respliced").as("provenance"))
        outside.unionByName(corrected)
      },
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od, o_totalprice AS price,
             |       'kept' AS provenance
             |FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' OR o_orderdate >= TIMESTAMP '1998-01-01'
             |UNION ALL
             |SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od, o_totalprice * 2 AS price,
             |       'respliced' AS provenance
             |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""".stripMargin)),

    // O6: snapshot diff (CDC between table versions) — classify every key as
    // added / removed / changed / unchanged via one full outer join on the
    // key with value comparison. The audit step after any reprocessing run
    // (the reference re-splices windows 3×/day with no diff report).
    // Versions are derived deterministically: v1 drops event_id % 11 = 0
    // (yesterday missed them), v2 doubles value on event_id % 7 = 0
    // (today's correction).
    Q("o6_snapshot_diff",
      (s, d) => {
        val e = Tables.events(s, d)
        val v1 = e.filter(col("event_id") % 11 =!= 0)
          .select(col("event_id").as("k1"), col("value").as("val1"))
        val v2 = e.select(col("event_id").as("k2"),
          when(col("event_id") % 7 === 0, col("value") * 2).otherwise(col("value"))
            .as("val2"))
        v1.join(v2, col("k1") === col("k2"), "full_outer")
          .select(coalesce(col("k1"), col("k2")).as("event_id"),
            when(col("k1").isNull, "added")
              .when(col("k2").isNull, "removed")
              .when(col("val1") =!= col("val2"), "changed")
              .otherwise("unchanged").as("change_type"),
            col("val1"), col("val2"))
          .filter(col("change_type") =!= "unchanged")
      },
      Some("""WITH v1 AS (
             |  SELECT event_id AS k1, value AS val1 FROM events WHERE event_id % 11 <> 0),
             |v2 AS (
             |  SELECT event_id AS k2,
             |    CASE WHEN event_id % 7 = 0 THEN value * 2 ELSE value END AS val2
             |  FROM events)
             |SELECT COALESCE(k1, k2) AS event_id,
             |  CASE WHEN k1 IS NULL THEN 'added'
             |       WHEN k2 IS NULL THEN 'removed'
             |       WHEN val1 <> val2 THEN 'changed'
             |       ELSE 'unchanged' END AS change_type,
             |  val1, val2
             |FROM v1 FULL OUTER JOIN v2 ON k1 = k2
             |WHERE (CASE WHEN k1 IS NULL THEN 'added'
             |       WHEN k2 IS NULL THEN 'removed'
             |       WHEN val1 <> val2 THEN 'changed'
             |       ELSE 'unchanged' END) <> 'unchanged'""".stripMargin)),

    // O7: SCD2 DIMENSION-TABLE build — w10_scd2_history's interval
    // compaction (the shared lag/run/lead pattern), taken to the warehouse
    // form a dimension load needs and w10's event-stream versioning does
    // not: (1) a same-day KEEPER ELECTION first (multiple observations per
    // (key, date) → one, max-o_orderkey wins) so the history is
    // date-grained; (2) the 9999-12-31 open-interval sentinel +
    // `is_current` flag (the lookup-friendly encoding: BETWEEN works
    // without null checks); (3) per-run observation counts. Materialized
    // as the customer_priority_history mart. Every window partitioned by
    // the dimension key — one shuffle on c_custkey at any scale.
    Q("o7_scd2_history",
      (s, d) => {
        val wDay = Window.partitionBy(col("c"), col("dt")).orderBy(col("o_orderkey").desc)
        val daily = Tables.orders(s, d)
          .select(col("o_custkey").as("c"), col("o_orderdate").cast("date").as("dt"),
            col("o_orderpriority").as("prio"), col("o_orderkey"))
          .withColumn("rn", row_number().over(wDay)).filter(col("rn") === 1)
        val wOrd = Window.partitionBy(col("c")).orderBy(col("dt"))
        val runs = daily
          .withColumn("chg",
            when(lag(col("prio"), 1).over(wOrd).isNull ||
              col("prio") =!= lag(col("prio"), 1).over(wOrd), 1).otherwise(0))
          .withColumn("run_id", sum(col("chg")).over(wOrd))
        val hist = runs.groupBy(col("c"), col("run_id"), col("prio"))
          .agg(min(col("dt")).as("valid_from"), count(lit(1)).as("n_obs"))
        val wRun = Window.partitionBy(col("c")).orderBy(col("run_id"))
        // open interval = the standard 9999-12-31 sentinel (a NULL valid_to
        // also breaks the driver's cross-engine null-date compare)
        hist.withColumn("next_from", lead(col("valid_from"), 1).over(wRun))
          .select(col("c").as("c_custkey"), col("run_id"),
            col("prio").as("priority"), col("valid_from"),
            coalesce(col("next_from"), to_date(lit("9999-12-31"))).as("valid_to"),
            col("next_from").isNull.as("is_current"), col("n_obs"))
      },
      Some("""WITH daily AS (
             |  SELECT o_custkey AS c, CAST(o_orderdate AS DATE) AS dt,
             |         o_orderpriority AS prio
             |  FROM orders
             |  QUALIFY row_number() OVER (
             |    PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
             |    ORDER BY o_orderkey DESC) = 1),
             |chg AS (SELECT c, dt, prio,
             |    CASE WHEN lag(prio) OVER (PARTITION BY c ORDER BY dt) IS NULL
             |           OR prio <> lag(prio) OVER (PARTITION BY c ORDER BY dt)
             |         THEN 1 ELSE 0 END AS is_chg
             |  FROM daily),
             |runs AS (SELECT c, dt, prio,
             |    SUM(is_chg) OVER (PARTITION BY c ORDER BY dt) AS run_id
             |  FROM chg),
             |hist AS (SELECT c, run_id, prio, MIN(dt) AS valid_from,
             |    COUNT(*) AS n_obs
             |  FROM runs GROUP BY 1, 2, 3)
             |SELECT c AS c_custkey, CAST(run_id AS BIGINT) AS run_id,
             |  prio AS priority, valid_from,
             |  COALESCE(lead(valid_from) OVER (PARTITION BY c ORDER BY run_id),
             |           DATE '9999-12-31') AS valid_to,
             |  lead(valid_from) OVER (PARTITION BY c ORDER BY run_id) IS NULL
             |    AS is_current,
             |  n_obs
             |FROM hist""".stripMargin)),

    // O8: interval coalescing (gaps-and-islands) — each order opens a
    // 30-day membership spell [o_orderdate, +30d]; overlapping/touching
    // spells per customer merge into continuous coverage islands
    // (Windows.intervalIslands), then one row per customer: island count
    // (lapses + 1), total covered days, longest continuous stretch.
    // Reference shape: the `[start_date, end_date]` membership intervals
    // (`fetch_capitan_membership_data.py:299-312`) the dashboard re-scans
    // per day (`dashboard.py:1014-1031`) — coalescing once is the
    // precomputation that query wants. Scale: one shuffle on o_custkey;
    // windows and aggs all share that partitioning.
    Q("o8_interval_merge",
      (s, d) => {
        import graft.ops.Windows
        val iv = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderdate").cast("date").as("start_d"),
            col("o_orderkey"))
          .withColumn("end_d", date_add(col("start_d"), 30))
        Windows.intervalIslands(iv, "o_custkey", "start_d", "end_d", "o_orderkey")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_islands"),
            sum(datediff(col("island_end"), col("island_start")) + 1)
              .as("covered_days"),
            max(datediff(col("island_end"), col("island_start")) + 1)
              .cast("long").as("longest_island_days"),
            sum(col("n_intervals")).as("n_spells"))
      },
      Some("""WITH iv AS (
             |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS start_d,
             |         CAST(o_orderdate AS DATE) + 30 AS end_d, o_orderkey
             |  FROM orders),
             |flagged AS (
             |  SELECT o_custkey, start_d, end_d, o_orderkey,
             |    CASE WHEN MAX(end_d) OVER (
             |        PARTITION BY o_custkey ORDER BY start_d, end_d, o_orderkey
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |      OR start_d > MAX(end_d) OVER (
             |        PARTITION BY o_custkey ORDER BY start_d, end_d, o_orderkey
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    THEN 1 ELSE 0 END AS new_isl
             |  FROM iv),
             |isl AS (
             |  SELECT o_custkey,
             |    SUM(new_isl) OVER (
             |      PARTITION BY o_custkey ORDER BY start_d, end_d, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_no,
             |    start_d, end_d
             |  FROM flagged),
             |islands AS (
             |  SELECT o_custkey, island_no, MIN(start_d) AS island_start,
             |    MAX(end_d) AS island_end, COUNT(*) AS n_intervals
             |  FROM isl GROUP BY 1, 2)
             |SELECT o_custkey, COUNT(*) AS n_islands,
             |  CAST(SUM(date_diff('day', island_start, island_end) + 1) AS BIGINT)
             |    AS covered_days,
             |  CAST(MAX(date_diff('day', island_start, island_end) + 1) AS BIGINT)
             |    AS longest_island_days,
             |  CAST(SUM(n_intervals) AS BIGINT) AS n_spells
             |FROM islands GROUP BY 1""".stripMargin))
  )
}

package graft.queries

import graft.core.Tables
import graft.ops.{Categorize, Normalize}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar function families (SURVEY.md §2.8 M1–M10) — all pure codegen'd
  * column expressions, no UDFs. */
object Scalars {

  // M3 config: ordered keyword table compiled into one `when` ladder on both
  // engines. Reference: `utils/stripe_and_square_helpers.py:50-92`.
  private val typeRules = Seq(
    "promo" -> "promotional", "economy" -> "budget", "standard" -> "standard",
    "small" -> "compact", "medium" -> "mid", "large" -> "big")

  val qs: Seq[Q] = Seq(

    // M1: string normalization (lower/trim/collapse/strip-non-alnum).
    Q("m1_normalize",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          Normalize.normText(concat(col("c_mktsegment"), lit("   "), col("c_name"))).as("norm_label"),
          Normalize.alnumOnly(col("c_name")).as("canon_name")),
      Some(s"""SELECT c_custkey,
              |${Normalize.normTextSql("c_mktsegment || '   ' || c_name")} AS norm_label,
              |${Normalize.alnumOnlySql("c_name")} AS canon_name
              |FROM customer""".stripMargin)),

    // M2: regex extraction (groups, anchored patterns).
    Q("m2_regex_extract",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "^(\\d+)-", 1).cast("long").as("priority_num"),
          regexp_extract(col("o_orderpriority"), "-(\\w+)$", 1).as("priority_word")),
      Some("""SELECT o_orderkey,
             |CAST(regexp_extract(o_orderpriority, '^(\d+)-', 1) AS BIGINT) AS priority_num,
             |regexp_extract(o_orderpriority, '-(\w+)$', 1) AS priority_word
             |FROM orders""".stripMargin)),

    // M3: first-match-wins keyword categorizer from a config table.
    Q("m3_keyword_ladder",
      (s, d) => Tables.part(s, d)
        .withColumn("category", Categorize.keywordLadder(col("p_type"), typeRules, "other"))
        .groupBy(col("category"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("p_retailprice")).as("retail_value")),
      Some(s"""SELECT ${Categorize.keywordLadderSql("p_type", typeRules, "other")} AS category,
              |COUNT(*) AS n, ${Q.dsumSql("p_retailprice")} AS retail_value
              |FROM part GROUP BY 1""".stripMargin)),

    // M4: date/time kit — trunc, last_day, datediff, months_between-style.
    Q("m4_date_functions",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
        .select(col("o_orderkey"), col("od"),
          trunc(col("od"), "MM").as("month_start"),
          last_day(col("od")).as("month_end"),
          (datediff(last_day(col("od")), trunc(col("od"), "MM")) + 1).cast("long").as("days_in_month"),
          date_trunc("quarter", col("od")).cast("date").as("quarter_start"),
          datediff(col("od"), trunc(col("od"), "MM")).cast("long").as("day_of_month_0")),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
             |CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |date_diff('day', CAST(date_trunc('month', o_orderdate) AS DATE),
             |          last_day(CAST(o_orderdate AS DATE))) + 1 AS days_in_month,
             |CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
             |date_diff('day', CAST(date_trunc('month', o_orderdate) AS DATE),
             |          CAST(o_orderdate AS DATE)) AS day_of_month_0
             |FROM orders""".stripMargin)),

    // M2b: the 3-group transfer parser — `"(item) from (giver) ((n) remaining)"`
    // with a lazy first group, built then parsed back in one plan.
    // Reference: `parse_pass_transfers.py:79-102`.
    Q("m2b_transfer_parse",
      (s, d) => {
        val pat = """(.+?) from ([^(]+) \((\d+) remaining\)"""
        Tables.orders(s, d)
          .withColumn("desc_str", concat(lit("Day Pass from Customer#"),
            col("o_custkey"), lit(" ("), col("o_orderkey") % 10, lit(" remaining)")))
          .select(col("o_orderkey"),
            regexp_extract(col("desc_str"), pat, 1).as("item"),
            regexp_extract(col("desc_str"), pat, 2).as("giver"),
            regexp_extract(col("desc_str"), pat, 3).cast("long").as("remaining"))
      },
      Some("""SELECT o_orderkey,
             |  regexp_extract(desc_str, '(.+?) from ([^(]+) \((\d+) remaining\)', 1) AS item,
             |  regexp_extract(desc_str, '(.+?) from ([^(]+) \((\d+) remaining\)', 2) AS giver,
             |  CAST(regexp_extract(desc_str, '(.+?) from ([^(]+) \((\d+) remaining\)', 3) AS BIGINT) AS remaining
             |FROM (
             |  SELECT o_orderkey, 'Day Pass from Customer#' || o_custkey || ' (' ||
             |         (o_orderkey % 10) || ' remaining)' AS desc_str
             |  FROM orders)""".stripMargin)),

    // M4b: the age idiom — (as_of - date).days / 365.25, floored. int/365.25
    // division is bit-identical IEEE in both engines.
    // Reference: `build_customer_master.py:125-127`.
    Q("m4b_age_calc",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          floor(datediff(lit("2024-01-31").cast("date"), col("o_orderdate").cast("date"))
            / 365.25).cast("long").as("age_years")),
      Some("""SELECT o_orderkey,
             |CAST(floor(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-01-31')
             |  / 365.25) AS BIGINT) AS age_years
             |FROM orders""".stripMargin)),

    // M5: md5-based deterministic A/B bucketing (portable across engines).
    // Reference: `customer_flags_config.py:58-132`.
    Q("m5_md5_ab_split",
      (s, d) => Tables.customer(s, d)
        .withColumn("ab_group", Normalize.abGroup(col("c_name"), 10))
        .groupBy(col("ab_group")).agg(count(lit(1)).as("n")),
      Some(s"""SELECT ${Normalize.abGroupSql("c_name", 10)} AS ab_group, COUNT(*) AS n
              |FROM customer GROUP BY 1""".stripMargin)),

    // M5b: the FULL A/B assignment — identifier priority email → phone-digits
    // → customer_id (phones without digits fall through to the id, like the
    // reference's empty-digit guard), with a manual override map applied
    // first as a broadcast lookup (the reference's AB_GROUP_OVERRIDES dict).
    // Reference: `customer_flags_config.py:58-132`.
    Q("m5b_ab_priority",
      (s, d) => {
        import s.implicits._
        val ck = col("c_custkey")
        // synthetic contact info: a third has email (messy case/spaces), a
        // third has phone (formatted; every 30th has a digitless one), a
        // third has neither — exercising every rung of the ladder
        val emailNorm = when(ck % 3 === 0,
          trim(lower(concat(lit("  User"), ck, lit("@Example.COM ")))))
        val phoneDigits = when(ck % 3 === 1,
          nullif(regexp_replace(
            when(ck % 30 === 1, lit("ext. abc"))
              .otherwise(concat(lit("(555) "), ck, lit("-01"))),
            "[^0-9]", ""), lit("")))
        val overrides = broadcast(Seq((7L, "A"), (42L, "B"), (1001L, "B"))
          .toDF("ov_key", "ov_group"))
        val hashSrc = coalesce(emailNorm, phoneDigits, ck.cast("string"))
        Tables.customer(s, d)
          .join(overrides, ck === col("ov_key"), "left")
          .select(ck,
            when(col("ov_group").isNotNull, lit("override"))
              .when(emailNorm.isNotNull, lit("email"))
              .when(phoneDigits.isNotNull, lit("phone"))
              .otherwise(lit("customer_id")).as("basis"),
            coalesce(col("ov_group"),
              when(Normalize.abGroup(hashSrc, 10) <= 4, lit("A")).otherwise(lit("B")))
              .as("ab_group"))
      },
      Some {
        val emailNorm = "trim(lower('  User' || c_custkey || '@Example.COM '))"
        val phoneDigits = "nullif(regexp_replace(CASE WHEN c_custkey % 30 = 1 " +
          "THEN 'ext. abc' ELSE '(555) ' || c_custkey || '-01' END, '[^0-9]', '', 'g'), '')"
        s"""WITH base AS (
           |  SELECT c_custkey,
           |    CASE WHEN c_custkey = 7 THEN 'A' WHEN c_custkey = 42 THEN 'B'
           |         WHEN c_custkey = 1001 THEN 'B' END AS ov_group,
           |    CASE WHEN c_custkey % 3 = 0 THEN $emailNorm END AS email_norm,
           |    CASE WHEN c_custkey % 3 = 1 THEN $phoneDigits END AS phone_digits
           |  FROM customer)
           |SELECT c_custkey,
           |  CASE WHEN ov_group IS NOT NULL THEN 'override'
           |       WHEN email_norm IS NOT NULL THEN 'email'
           |       WHEN phone_digits IS NOT NULL THEN 'phone'
           |       ELSE 'customer_id' END AS basis,
           |  COALESCE(ov_group,
           |    CASE WHEN ${Normalize.abGroupSql(
                      "COALESCE(email_norm, phone_digits, CAST(c_custkey AS VARCHAR))", 10)} <= 4
           |         THEN 'A' ELSE 'B' END) AS ab_group
           |FROM base""".stripMargin
      }),

    // M7: money math — tax decomposition + proportional allocation with
    // last-row rounding fix, in exact decimal so the adjustment is
    // order-independent. Reference: `fetch_square_data.py:623-706`,
    // tax split `pipeline_handler.py:87-89`.
    Q("m7_money_allocation",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d).select(col("o_orderkey").as("ok"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("order_total"))
        val totals = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("lines_total"))
        val w = Window.partitionBy(col("l_orderkey"))
        li.join(totals, Seq("l_orderkey")).join(o, col("l_orderkey") === col("ok"))
          .withColumn("alloc",
            round(col("l_extendedprice") / col("lines_total").cast("double") *
              col("order_total").cast("double"), 2).cast(DecimalType(18, 2)))
          .withColumn("alloc_sum", sum(col("alloc")).over(w))
          .withColumn("is_last", col("l_linenumber") === max(col("l_linenumber")).over(w))
          .select(col("l_orderkey"), col("l_linenumber"),
            when(col("is_last"), (col("order_total") - (col("alloc_sum") - col("alloc"))).cast(DecimalType(18, 2)))
              .otherwise(col("alloc")).cast("double").as("allocated"))
      },
      Some("""WITH totals AS (
             |  SELECT l_orderkey AS tk, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS lines_total
             |  FROM lineitem GROUP BY 1),
             |base AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CAST(round(l_extendedprice / CAST(lines_total AS DOUBLE)
             |         * CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS DECIMAL(18,2)) AS alloc,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS order_total
             |  FROM lineitem JOIN totals ON l_orderkey = tk
             |  JOIN orders ON l_orderkey = o_orderkey)
             |SELECT l_orderkey, l_linenumber,
             |  CAST(CASE WHEN l_linenumber = MAX(l_linenumber) OVER (PARTITION BY l_orderkey)
             |    THEN CAST(order_total - (SUM(alloc) OVER (PARTITION BY l_orderkey) - alloc) AS DECIMAL(18,2))
             |    ELSE alloc END AS DOUBLE) AS allocated
             |FROM base""".stripMargin),
      bench = true),

    // M8: JSON payload extraction (tolerant, schema-on-read).
    // Reference: `customer_events_builder.py:196-203`, `customer_flags_engine.py:459-491`.
    Q("m8_json_extract",
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total_value")),
      Some(s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k, COUNT(*) AS n,
              |${Q.dsumSql("value")} AS total_value
              |FROM events GROUP BY 1""".stripMargin)),

    // M8b: TYPED schema-on-read — from_json parses the payload once into a
    // struct (codegen'd Jackson parse; the multi-field upgrade over M8's
    // per-path get_json_object), tolerating injected corrupt payloads as
    // null fields. The oracle mirrors the corruption branch directly, so the
    // compare proves the malformed rows land in the NULL group.
    Q("m8b_typed_json",
      (s, d) => {
        val corrupted = Tables.events(s, d)
          .withColumn("raw",
            when(col("event_id") % 997 === 0, lit("{broken")).otherwise(col("props")))
        corrupted
          .withColumn("p", from_json(col("raw"), lit("k BIGINT")))
          .groupBy((col("p.k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("total_value"))
      },
      Some(s"""SELECT CASE WHEN event_id % 997 = 0 THEN NULL
              |  ELSE CAST(json_extract_string(props, '$$.k') AS BIGINT) % 10 END AS k_mod,
              |COUNT(*) AS n, ${Q.dsumSql("value")} AS total_value
              |FROM events GROUP BY 1""".stripMargin)),

    // M9: array/set aggregation with deterministic ordering + delimited join.
    // Reference: sources pipe-join `build_customer_master.py:263-265`.
    Q("m9_array_set_agg",
      (s, d) => Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(concat_ws(",", array_sort(collect_set(col("c_mktsegment")))).as("segments"),
          countDistinct(col("c_mktsegment")).as("n_segments")),
      Some("""SELECT c_nationkey, string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
             |COUNT(DISTINCT c_mktsegment) AS n_segments
             |FROM customer GROUP BY c_nationkey""".stripMargin)),

    // M6+M10: similarity ratio + rounding/casting kit in one pass.
    Q("m10_cast_round",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          round(col("c_acctbal"), 1).as("bal_1dp"),
          col("c_acctbal").cast("long").as("bal_int"),
          format_string("%09d", col("c_custkey")).as("key_padded"),
          round(Normalize.levRatio(col("c_name"), lit("Customer#000000000")), 6).as("sim_to_zero")),
      Some(s"""SELECT c_custkey, round(c_acctbal, 1) AS bal_1dp,
              |CAST(TRUNC(c_acctbal) AS BIGINT) AS bal_int,
              |format('{:09d}', c_custkey) AS key_padded,
              |round(${Normalize.levRatioSql("c_name", "'Customer#000000000'")}, 6) AS sim_to_zero
              |FROM customer""".stripMargin)),

    // M12: higher-order array functions (filter / transform / aggregate /
    // exists / slice) over tokenized text — the lambda surface DuckDB
    // mirrors with list_* functions.
    Q("m12_higher_order_arrays",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(expr("filter(toks, t -> length(t) > 5)")).cast("long").as("n_long"),
          expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
            .as("char_sum"),
          expr("exists(toks, t -> t = 'the')").as("has_the"),
          expr("array_join(slice(transform(toks, t -> upper(t)), 1, 3), ' ')")
            .as("first3_upper")),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT) AS n_long,
             |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS char_sum,
             |  list_contains(string_split(text, ' '), 'the') AS has_the,
             |  array_to_string(list_transform(string_split(text, ' '), t -> upper(t))[1:3], ' ') AS first3_upper
             |FROM documents""".stripMargin)),

    // M11: end-to-end DECIMAL money columns — SURVEY §1.2's flagged upgrade
    // path from the reference's float dollars. Ingest casts to DECIMAL(12,2)
    // and all arithmetic stays exact decimal; the widening casts preserve
    // scale (2→2, 4→4) so no rounding rule is ever exercised and both
    // engines agree digit-for-digit. The final values are serialized to
    // their plain decimal strings: that pins the exact representation
    // across engines (pandas reads parquet decimals as objects while
    // DuckDB's client hands back doubles — a comparator gap, not a value
    // difference).
    Q("m11_decimal_money",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_extendedprice").cast(DecimalType(12, 2)).as("price_d"),
          col("l_discount").cast(DecimalType(12, 2)).as("disc_d"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("price_d")).cast(DecimalType(18, 2)).cast("string").as("gross_dec"),
          sum(col("price_d") * (lit(1).cast(DecimalType(12, 2)) - col("disc_d")))
            .cast(DecimalType(18, 4)).cast("string").as("net_dec"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag,
             |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
             |       AS VARCHAR) AS gross_dec,
             |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             |            * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
             |       AS DECIMAL(18,4)) AS VARCHAR) AS net_dec,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY 1""".stripMargin))
  )
}

package graft.queries

import graft.core.Tables
import graft.ops.{Categorize, Normalize}
import org.apache.spark.sql.functions._

/** Composite dashboard read-path queries (SURVEY.md §3 EP3) — the chart
  * queries the reference computes per render (`dashboard.py:555-776`),
  * expressed as single lazy plans: scan → broadcast dim → keyword
  * categorization → conditional aggs → share-of-total. */
object Dashboard {

  private val partRules = Seq(
    "widget" -> "Widgets", "bolt" -> "Hardware", "rod" -> "Hardware",
    "gear" -> "Climbing", "rope" -> "Climbing")

  val qs: Seq[Q] = Seq(

    // EP3: monthly revenue by product category with gross/refund/net and
    // refund rate plus category share of the month's net.
    // Reference: `dashboard.py:555-776` (category revenue + % of total +
    // refund rate in one chart).
    Q("ep3_revenue_dashboard",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val part = Tables.part(s, d)
          .withColumn("category", Categorize.keywordLadder(col("p_name"), partRules, "Other"))
          .select(col("p_partkey"), col("category"))
        val base = li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
          .withColumn("month", date_trunc("month", col("l_shipdate")).cast("date"))
          .withColumn("net_amt", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        val byCat = base.groupBy(col("month"), col("category"))
          .agg(
            Q.dsum(when(col("l_returnflag") =!= "R", col("net_amt"))).as("gross"),
            Q.dsum(when(col("l_returnflag") === "R", col("net_amt"))).as("refunds"),
            Q.dsum(when(col("l_returnflag") =!= "R", col("net_amt"))
              .otherwise(-col("net_amt"))).as("net"),
            count(lit(1)).as("n_lines"))
        // month totals via a window over the category rollup (net is
        // 4-decimal exact, so re-summing in decimal stays deterministic) —
        // ONE scan of the fact table, no self-join recompute (a month×category
        // join formulation made Spark evaluate the rollup twice; no exchange
        // reuse fires across the differing subplans).
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.types.DecimalType
        byCat.withColumn("month_net",
            sum(col("net").cast(DecimalType(18, 4)))
              .over(Window.partitionBy(col("month"))).cast("double"))
          .select(col("month"), col("category"), col("gross"), col("refunds"), col("net"),
            col("n_lines"),
            round(col("refunds") / col("gross") * 100, 6).as("refund_rate_pct"),
            round(col("net") / col("month_net") * 100, 6).as("share_of_month_pct"))
      },
      Some {
        val cat = Categorize.keywordLadderSql("p_name", partRules, "Other")
        s"""WITH base AS (
           |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
           |         $cat AS category, l_returnflag,
           |         l_extendedprice * (1.0 - l_discount) AS net_amt
           |  FROM lineitem JOIN part ON l_partkey = p_partkey),
           |by_cat AS (
           |  SELECT month, category,
           |    ${Q.dsumSql("CASE WHEN l_returnflag <> 'R' THEN net_amt END")} AS gross,
           |    ${Q.dsumSql("CASE WHEN l_returnflag = 'R' THEN net_amt END")} AS refunds,
           |    ${Q.dsumSql("CASE WHEN l_returnflag <> 'R' THEN net_amt ELSE -net_amt END")} AS net,
           |    COUNT(*) AS n_lines
           |  FROM base GROUP BY 1, 2),
           |with_tot AS (
           |  SELECT *, CAST(SUM(CAST(net AS DECIMAL(18,4))) OVER (PARTITION BY month) AS DOUBLE)
           |    AS month_net
           |  FROM by_cat)
           |SELECT month, category, gross, refunds, net, n_lines,
           |  round(refunds / gross * 100, 6) AS refund_rate_pct,
           |  round(net / month_net * 100, 6) AS share_of_month_pct
           |FROM with_tot""".stripMargin
      },
      bench = true),

    // P6: the dashboard's chained boolean feature-toggle filter stack —
    // Catalyst collapses the chain into one predicate (CombineFilters).
    // Reference: `dashboard.py:980-1012`.
    Q("p6_filter_stack",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_returnflag") =!= "R")
        .filter(col("l_discount") < 0.09)
        .filter(col("l_quantity") >= 5)
        .filter(col("l_tax") <= 0.06)
        .filter(!col("l_linestatus").isin("X"))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Q.dsum(col("l_extendedprice")).as("value")),
      Some(s"""SELECT l_linestatus, COUNT(*) AS n, ${Q.dsumSql("l_extendedprice")} AS value
              |FROM lineitem
              |WHERE l_returnflag <> 'R' AND l_discount < 0.09 AND l_quantity >= 5
              |  AND l_tax <= 0.06 AND l_linestatus NOT IN ('X')
              |GROUP BY l_linestatus""".stripMargin)),

    // J8: equi-join on a NORMALIZED string key (the reference joins
    // transactions to customers on lowercased trimmed names,
    // `customer_events_builder.py:77-85`).
    Q("j8_normalized_key_join",
      (s, d) => {
        val dim = Tables.customer(s, d)
          .select(upper(col("c_mktsegment")).as("seg_raw")).distinct()
          .withColumn("seg_key", Normalize.normText(col("seg_raw")))
          .withColumn("seg_code", substring(col("seg_raw"), 1, 4))
        Tables.customer(s, d)
          .withColumn("seg_key", Normalize.normText(col("c_mktsegment")))
          .join(broadcast(dim), Seq("seg_key"))
          .groupBy(col("seg_code")).agg(count(lit(1)).as("n"))
      },
      Some(s"""WITH dim AS (
              |  SELECT DISTINCT upper(c_mktsegment) AS seg_raw,
              |    ${Normalize.normTextSql("upper(c_mktsegment)")} AS seg_key,
              |    substr(upper(c_mktsegment), 1, 4) AS seg_code
              |  FROM customer)
              |SELECT seg_code, COUNT(*) AS n
              |FROM customer JOIN dim
              |  ON ${Normalize.normTextSql("c_mktsegment")} = seg_key
              |GROUP BY seg_code""".stripMargin)),

    // EP4: corpus DATA CARD — the per-source release sheet every training
    // dataset ships: volume (docs, tokens), language purity, mean quality,
    // median length, exact-dup rate. One hash aggregation over the corpus;
    // the mean quality divides a quantized-decimal sum in DOUBLE (decimal
    // division scale is engine-specific — the k2b lesson) and the median is
    // percentile_disc (portable, a17's pattern).
    Q("ep4_corpus_datacard",
      (s, d) => {
        import graft.ops.TextAnalysis
        Tables.documents(s, d).groupBy(col("source")).agg(
            count(lit(1)).as("n_docs"),
            sum(TextAnalysis.wsTokens(col("text"))).as("n_tokens"),
            round(avg(when(col("lang") === "en", 1.0).otherwise(0.0)), 6).as("pct_en"),
            round(Q.dsum(TextAnalysis.qualityScore("text")) / count(lit(1)), 6)
              .as("avg_quality"),
            // n_chars is integral: DuckDB's percentile_disc returns the input
            // type while Spark's returns DOUBLE — pin both to BIGINT (exact:
            // percentile_disc yields an actual data value, no interpolation).
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
              .cast("long").as("med_chars"),
            countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_unique"))
          .withColumn("dup_rate", round(
            lit(1.0) - col("n_unique").cast("double") / col("n_docs").cast("double"), 6))
      },
      Some {
        import graft.ops.TextAnalysis
        s"""SELECT source, n_docs, n_tokens, pct_en, avg_quality, med_chars, n_unique,
           |  round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 6) AS dup_rate
           |FROM (
           |  SELECT source, COUNT(*) AS n_docs,
           |    CAST(SUM(${TextAnalysis.wsTokensSql("text")}) AS BIGINT) AS n_tokens,
           |    round(AVG(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6) AS pct_en,
           |    round(${Q.dsumSql(TextAnalysis.qualityScoreSql("text"))} / COUNT(*), 6)
           |      AS avg_quality,
           |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
           |      AS med_chars,
           |    CAST(COUNT(DISTINCT ${TextAnalysis.fingerprintSql("text")}) AS BIGINT)
           |      AS n_unique
           |  FROM documents GROUP BY 1)""".stripMargin
      }),

    // M7b: the 8.25% tax decomposition applied at ingest
    // (`pipeline_handler.py:87-89`: pre_tax = total/1.0825, tax = rest).
    Q("m7b_tax_split",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          round(col("o_totalprice") / 1.0825, 2).as("pre_tax"),
          round(col("o_totalprice") - col("o_totalprice") / 1.0825, 2).as("tax_amount")),
      Some("""SELECT o_orderkey, round(o_totalprice / 1.0825, 2) AS pre_tax,
             |round(o_totalprice - o_totalprice / 1.0825, 2) AS tax_amount
             |FROM orders""".stripMargin))
  )
}

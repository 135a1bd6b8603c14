package graft

import graft.queries.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide smoke: every declared query must execute on sf0.001 and the
  * core ones must return rows. (Value-level correctness is the driver's
  * DuckDB-oracle gate — `scripts/check_oracle.py` locally.) */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // Queries whose correct result can legitimately be empty at tiny scale.
  private val mayBeEmpty = Set("a9_dup_groups", "j9_amount_date_link",
    "d4_ngram_jaccard", "k3_embedding_neardup", "a12_count_threshold")

  // Queries with deliberately no oracle — empty since round 5: the five
  // sketch/ANN queries (a4b, a17b, k2b, k2c, k6) now emit tolerance/recall
  // VERDICT columns the oracle asserts, so every declared query is
  // machine-checked by the driver's hash gate.
  private val noOracleByDesign = Set.empty[String]

  test("query names are unique and every query has oracle SQL or a reason") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length)
    val missing = Registry.all.filter(q => q.oracle.isEmpty && !noOracleByDesign(q.name))
    assert(missing.isEmpty, s"queries without oracle or declared reason: ${missing.map(_.name)}")
  }

  test("approx_count_distinct stays within 5% of exact per month") {
    // a4b emits the verdict itself; assert it holds and the exact column
    // matches a4's independent computation
    val a4b = Registry.all.find(_.name == "a4b_approx_distinct").get.run(spark, sf)
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = Registry.all.find(_.name == "a4_distinct_count").get.run(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(a4b.keySet == exact.keySet)
    exact.foreach { case (m, n) =>
      val (nExact, ok) = a4b(m)
      assert(nExact == n, s"month $m: a4b exact $nExact vs a4 $n")
      assert(ok, s"month $m: HLL estimate outside 5% of $n")
    }
  }

  test("approx percentiles land within rank tolerance of the exact values") {
    // a17b emits the rank-band verdicts itself; assert they hold and the
    // exact columns match a17's independent computation
    val exact = Registry.all.find(_.name == "a17_percentiles").get.run(spark, sf)
      .selectExpr("c_mktsegment", "p50_bal", "p90_bal")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val a17b = Registry.all.find(_.name == "a17b_approx_percentiles").get.run(spark, sf)
      .selectExpr("c_mktsegment", "p50_exact", "p90_exact",
        "p50_in_rank_band", "p90_in_rank_band")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(a17b.keySet == exact.keySet)
    exact.foreach { case (seg, (p50, p90)) =>
      val (e50, e90, ok50, ok90) = a17b(seg)
      assert(e50 == p50 && e90 == p90, s"$seg: exact columns diverge from a17")
      assert(ok50 && ok90, s"$seg: sketch outside the ±5% rank band")
    }
  }

  test("scan plans prune: s3 partition filter, s1 parquet pushdown") {
    val p3 = Registry.all.find(_.name == "s3_snapshot_prune").get.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p3.contains("PartitionFilters") && p3.contains("o_month"),
      s"expected partition pruning on o_month in:\n$p3")
    val p1 = Registry.all.find(_.name == "s1_scan_prune").get.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p1.contains("PushedFilters") && p1.contains("LessThan(l_shipdate"),
      s"expected l_shipdate pushdown in:\n$p1")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Nested-loop by DESIGN — everything else must hash/merge join. Two legal
  // shapes: all-pairs semantics, and a cross join whose build side is a
  // broadcast 1-row (grand total) or k-row (centroid table) frame — a
  // nested loop over a handful of broadcast rows is the right plan at any
  // scale.
  private val nljByDesign = Set(
    "k1_knn_bruteforce",       // exact brute-force baseline: query×corpus by definition
    "k3_embedding_neardup",    // all-pairs cosine inside buckets by definition
    "a6_pct_of_total",         // 1-row grand-total broadcast
    "j9b_refund_redistribution", // two 1-row total broadcasts
    "k2b_knn_ivf_centroid",    // k-row centroid table broadcast
    "k2c_knn_ivf_kmeans",      // k-row centroid broadcast per Lloyd iteration
    "k6_pq_adc",               // k-row centroid broadcast per Lloyd iteration + m-row query subs
    "t11_tfidf",               // 1-row corpus-total broadcast (same shape as a6)
    "c2_curation_v2",          // inherits t15's 1-row grand-total broadcast
    "c4_curation_dsir",        // inherits t15's + t23's 1-row grand-total broadcasts
    "t17_temperature_mix",     // 1-row source-min broadcast onto the rate table
    "k8_ann_recall",           // contains k1's exact brute-force baseline by definition
    "k13_ann_probe_sweep",     // k8's shape per radius: brute-force baseline + 1-row crosses
    "t15_unigram_surprisal",   // 1-row corpus-total broadcast (same shape as a6)
    "t23_dsir_importance",     // 1-row corpus-total broadcast onto the B-row ratio table
    "k9_sq8_ann",              // exact brute-force over codes: 1-row query broadcast (k1 shape)
    "t24_cms_heavy_hitters",   // 1-row corpus-total broadcast (same shape as a6)
    "ml1_nb_quality_scores",   // 1-row prior + 1-row train-total broadcasts
    "ml2_nb_holdout_eval",     // inherits ml1's shape + 1-row confusion-matrix crosses
    "ml3_nb_pr_curve",         // inherits ml1's 1-row prior/total broadcasts
    "ml4_nb_calibration",      // inherits ml1's 1-row prior/total broadcasts
    "k12_cluster_quality",     // L-row centroid×centroid separation pairs (L = cell count)
    "t25_bm25_retrieval",      // 1-row avgdl broadcast (same shape as a6)
    "t26_source_drift",        // 1-row grand-total + 1-row cohort-mean broadcasts
    "a4d_hll_merge_daily",     // 1-row merged × 1-row direct sketch cross
    "k15_pca_ann",             // k1's 1-row query broadcast, twice (projected + exact)
    "a18b_quantile_merge_daily", // 1-row day-count × 1-row merge-check crosses
    "gr2_cc_star",             // 1-row edge-consistency verdict broadcast
    "gr4_kcore_dupfarms",      // 1-row convergence verdict broadcast (gr2 shape)
    "dq2_constraint_report",   // 1-row per-table metric crosses (Deequ suite)
    "t32_hybrid_rrf",          // inherits t25's 1-row avgdl/corpus-total broadcasts
    "t34_kn_surprisal",        // 1-row (T, V) model-totals broadcast (a6 shape)
    "d11_cosine_allpairs",     // 1-row corpus-total broadcast (t11 shape)
    "d12_source_overlap",      // S-row × S-row upper-triangle matrix (S = fixed source domain)
    "a20_basket_lift",         // 1-row n_orders broadcast (a6 shape)
    "a4e_hll_overlap",         // T-row × T-row type-pair sketch pairing (T = fixed type domain)
    "k17_index_rot_audit"      // exact-recall ground truth: corpus × 5-row broadcast probe
                               // table (k8_ann_recall's shape — linear in the corpus)
  )

  test("no batch query plans a nested-loop or cartesian join unless by design") {
    val offenders = Registry.all
      .filterNot(q => q.name.startsWith("st")) // streaming: run() executes the stream
      .filterNot(q => nljByDesign(q.name))
      .flatMap { q =>
        val plan = q.run(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
          Some(q.name)
        else None
      }
    assert(offenders.isEmpty,
      s"nested-loop/cartesian plans (fix or declare by-design): $offenders")
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001" +
        (if (mayBeEmpty(q.name)) "" else " and returns rows")) {
      val n = q.run(spark, sf).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}

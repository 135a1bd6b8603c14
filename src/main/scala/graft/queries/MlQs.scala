package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Classifier, TextAnalysis}

/** Model-based curation: train a classifier on weak labels, score the
  * corpus, evaluate held-out — the CCNet/GPT-3 "quality filter" stage
  * (reference analogue: the rule-based curation gates of
  * `data_pipeline/clean_data.py`; the model-based form is the at-scale
  * successor those heuristics seed).
  *
  * The weak label reuses t23's target pair (lang = en ∧ quality ≥ 0.8) so
  * the learned NB weights are directly comparable to the DSIR importance
  * weights over the same hashed-unigram feature space. The holdout is the
  * leakage-safe salted-hash slice (t13's split op, not a raw modulus —
  * the testdata assigns `source` by doc_id % 20, so any small-modulus
  * split is CONFOUNDED with source; the hash split is how a real pipeline
  * avoids exactly that).
  *
  * Honesty note, verified at sf0.01: this synthetic corpus draws all
  * classes from one shared vocabulary, so the unigram signal for the weak
  * label sits below the class prior and the trained model collapses to
  * the majority class — ml2 reports recall = 0. That IS the artifact
  * working: the holdout eval row is the gate a curation pipeline checks
  * before rolling a filter model out, and here it correctly says "do not
  * deploy". `OpsSpec` proves the same closed-form training reaches
  * accuracy 1.0 on a separable corpus, and that holdout text never leaks
  * into the weights.
  */
object MlQs {

  private val labelSql = s"lang = 'en' AND ${TextAnalysis.qualityScoreSql("text")} >= 0.8"
  private val holdoutSql = s"${TextAnalysis.hashUnitSql("doc_id", "nbsplit")} % 5 = 0"
  private val B = 1024

  // Spans the score range the prior puts the mass in (ml2 shows scores
  // hover near the negative prior on this corpus) out to a clearly
  // accept-everything point, so the curve's shape is visible either way.
  private val prThresholds = Seq(-4.0, -3.0, -2.0, -1.5, -1.0, -0.5, 0.0, 1.0)

  private def scored(s: org.apache.spark.sql.SparkSession, d: String) =
    Classifier.nbScores(Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en" && TextAnalysis.qualityScore("text") >= 0.8,
      TextAnalysis.hashUnit(col("doc_id"), "nbsplit") % 5 === 0, buckets = B)

  def qs: Seq[Q] = Seq(

    // ML1: per-doc NB quality scores — every doc (train + holdout) scored
    // by the closed-form hashed-unigram Naive Bayes model trained on the
    // non-holdout slice. Full hash gate: weights pin to DECIMAL(18,4).
    Q("ml1_nb_quality_scores",
      (s, d) => scored(s, d),
      Some(Classifier.nbSql("doc_id", "text", "documents",
        labelSql, holdoutSql, B, perDoc = true)), bench = true),

    // ML2: held-out evaluation — confusion matrix + accuracy/precision/
    // recall on the hash-holdout slice the training never saw. The metric
    // row is the artifact a curation pipeline gates model rollout on.
    Q("ml2_nb_holdout_eval",
      (s, d) => Classifier.nbHoldoutEval(scored(s, d)),
      Some(Classifier.nbSql("doc_id", "text", "documents",
        labelSql, holdoutSql, B, perDoc = false))),

    // ML3: operating-point sweep — the precision/recall/F1 curve over the
    // holdout at a declared threshold ladder. This is how the gate's
    // threshold gets CHOSEN (recall-tuned keeps more data, precision-tuned
    // keeps cleaner data) — and a majority-class model shows a flat curve
    // here, which is the diagnosis behind ml2's verdict.
    Q("ml3_nb_pr_curve",
      (s, d) => Classifier.nbPrCurve(scored(s, d), prThresholds),
      Some(Classifier.nbPrCurveSql("doc_id", "text", "documents",
        labelSql, holdoutSql, B, prThresholds))),

    // ML4: reliability diagram — calibration bins of the sigmoid'd NB
    // score vs the empirical positive rate on the holdout. The companion
    // read to ml3: ml3 picks a threshold, ml4 says whether the score can
    // be TRUSTED as a probability (for e.g. soft-weighting docs instead
    // of hard-gating them). On this corpus the mass sits in the prior's
    // bin — visible as a single heavy bin, the majority-collapse shape.
    Q("ml4_nb_calibration",
      (s, d) => Classifier.nbCalibration(scored(s, d), bins = 10),
      Some(Classifier.nbCalibrationSql("doc_id", "text", "documents",
        labelSql, holdoutSql, B, bins = 10))),

    // ML5: closed-form OLS — the LINEAR PROBE training pattern
    // (ops/Regression.scala): one corpus pass of exact BIGINT moment sums
    // (map-side combinable, order-independent), then the 3×3 normal
    // equations solved by Cramer's rule INSIDE the plan through one fixed
    // IEEE expression tree mirrored verbatim in the oracle — so the
    // coefficients and R² hash-match exactly (the a4c precedent). Probe:
    // n_chars ~ 1 + token_count + distinct_token_count; fit_ok asserts a
    // real fit (chars are near-linear in tokens by construction). No SGD,
    // no iterations — at 100 TB this trains in exactly one aggregation.
    Q("ml5_linreg_probe",
      (s, d) => graft.ops.Regression.olsSolve(
          graft.ops.Regression.olsMoments(Tables.documents(s, d),
            size(split(col("text"), " ")),
            size(array_distinct(split(col("text"), " "))),
            col("n_chars")))
        .withColumn("fit_ok", col("r2") > 0.5 && col("r2") <= 1.0),
      Some(s"""SELECT s.*, s.r2 > 0.5 AND s.r2 <= 1.0 AS fit_ok
              |FROM (${graft.ops.Regression.olsSql(
                "len(string_split(text, ' '))",
                "len(list_distinct(string_split(text, ' ')))",
                "n_chars", "documents")}) s""".stripMargin)),

    // ML6: batch PERCEPTRON — the iterative-training shape next to ml1's
    // closed-form NB and ml5's one-pass OLS: 4 synchronous integer rounds
    // over the same hashed-unigram feature space and the same weak
    // label/holdout split, every misclassified train doc contributing its
    // update simultaneously (the doc-order-free variant — a sequential
    // perceptron cannot be replayed across partitionings). Margins and
    // weights are pure int64, so the 4-round recurrence replays
    // bit-identically in the unrolled-CTE oracle (the gr1/gr5 contract) —
    // a TRAINING LOOP under the full hash gate, not a tolerance check.
    // Same honesty note as ml1: on this shared-vocabulary corpus the
    // signal sits below the prior, and the linear model settles near the
    // majority class — OpsSpec proves convergence on a separable corpus
    // and that holdout docs never touch the weights.
    // Scale: spine built once + checkpointed; per round one (B+1)-row
    // broadcast join + two map-side-combinable integer sums; weight state
    // KB-sized at any corpus.
    Q("ml6_perceptron_gate",
      (s, d) => Classifier.perceptronScores(Tables.documents(s, d),
        "doc_id", "text",
        col("lang") === "en" && TextAnalysis.qualityScore("text") >= 0.8,
        TextAnalysis.hashUnit(col("doc_id"), "nbsplit") % 5 === 0,
        buckets = B, rounds = 4),
      Some(Classifier.perceptronSql("doc_id", "text", "documents",
        labelSql, holdoutSql, B, rounds = 4)),
      bench = true))
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** First-match-wins keyword categorization (SURVEY.md §2.8 M3).
  *
  * The reference walks ordered keyword dicts with `break` semantics
  * (`/root/reference/utils/stripe_and_square_helpers.py:50-92`,
  * `config.py:151-231`). Here the same config shape — an ordered
  * (keyword → category) table — is compiled at plan-build time into a single
  * `when` ladder over `lower(text)`, which Catalyst folds into one codegen'd
  * case expression: no UDF, fully pushdown/prune-friendly.
  */
object Categorize {

  /** Compile an ordered keyword table into a first-match-wins ladder. */
  def keywordLadder(text: Column, rules: Seq[(String, String)], default: String): Column = {
    val lowered = lower(text)
    rules.foldLeft(Option.empty[Column]) { case (acc, (kw, cat)) =>
      val hit = lowered.contains(kw.toLowerCase)
      Some(acc.fold(when(hit, cat))(_.when(hit, cat)))
    }.map(_.otherwise(default)).getOrElse(lit(default))
  }

  /** Same ladder as a DuckDB CASE expression — oracle-side mirror. */
  def keywordLadderSql(textExpr: String, rules: Seq[(String, String)], default: String): String = {
    val whens = rules.map { case (kw, cat) =>
      s"WHEN lower($textExpr) LIKE '%${kw.toLowerCase}%' THEN '$cat'"
    }.mkString(" ")
    s"CASE $whens ELSE '$default' END"
  }

  /** Bucket ladder over a numeric column: ordered (upperBoundExclusive, label),
    * final label for values >= last bound. Reference: connection strength score
    * `build_customer_connections.py:17-39`. */
  def bucketLadder(x: Column, bounds: Seq[(Double, String)], top: String): Column =
    bounds.foldLeft(Option.empty[Column]) { case (acc, (ub, label)) =>
      val hit = x < ub
      Some(acc.fold(when(hit, label))(_.when(hit, label)))
    }.map(_.otherwise(top)).getOrElse(lit(top))

  def bucketLadderSql(xExpr: String, bounds: Seq[(Double, String)], top: String): String = {
    val whens = bounds.map { case (ub, label) => s"WHEN ($xExpr) < $ub THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '$top' END"
  }
}

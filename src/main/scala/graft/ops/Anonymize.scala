package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Privacy operators for publishing training data derived from user records:
  * stable pseudonymization, digit redaction, and k-anonymity-style
  * generalization. All pure column expressions (codegen'd, shuffle-free) —
  * the only shuffle a k-anonymity pass needs is the group-size window over
  * the quasi-identifier, which hash-partitions on that key.
  *
  * (Reference analogue: the pipeline ships raw customer names/emails into
  * warehouse tables, e.g. `customer_events_builder.py`; an engine feeding
  * model training needs the scrubbed form.)
  */
object Anonymize {

  /** Stable pseudonymous id: salted md5 of the natural key. Deterministic
    * (joins on the pseudonym still work across tables anonymized with the
    * same salt) but not reversible without the salt. */
  def pseudonym(c: Column, salt: String): Column =
    md5(concat(lit(salt + "|"), c.cast("string")))

  def pseudonymSql(e: String, salt: String): String =
    s"md5('$salt|' || CAST($e AS VARCHAR))"

  /** Redact every digit (defeats embedded ids/phones in free text).
    * DuckDB's regexp_replace is first-match-only by default — the oracle
    * spelling needs the 'g' flag to match Spark's replace-all. */
  def redactDigits(c: Column): Column = regexp_replace(c, "[0-9]", "#")

  def redactDigitsSql(e: String): String =
    s"regexp_replace($e, '[0-9]', '#', 'g')"

  /** Generalize a numeric to its bucket lower bound (k-anonymity coarsening):
    * floor(c / width) * width as BIGINT. Exact for |c| well under 2^52. */
  def generalize(c: Column, width: Long): Column =
    (floor(c / width) * width).cast("long")

  def generalizeSql(e: String, width: Long): String =
    s"CAST(FLOOR(($e) / $width) AS BIGINT) * $width"
}

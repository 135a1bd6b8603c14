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

  /** Email address pattern (Java regex and RE2 agree on it: no alternation,
    * greedy quantifiers over disjoint classes — leftmost-first == leftmost-
    * longest here). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone pattern (optional +CC prefix). */
  val PhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Residual digit runs (ids, zips, account numbers) AFTER the structured
    * patterns are lifted out. */
  val DigitRunRe = "[0-9]{3,}"

  /** PII scrub for free text: emails → <EMAIL>, phones → <PHONE>, then any
    * leftover run of >= 3 digits → ###. Order matters — the structured
    * patterns must be recognized as units before the digit fallback shreds
    * them. Pure row-local codegen: at 100 TB the scrubber runs at scan
    * speed. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      DigitRunRe, "###")

  def scrubPiiSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($e,
       |  '$EmailRe', '<EMAIL>', 'g'),
       |  '$PhoneRe', '<PHONE>', 'g'),
       |  '$DigitRunRe', '###', 'g')""".stripMargin

  /** Match count for a PII pattern (detection/reporting side of the scrub). */
  def piiCount(c: Column, re: String): Column = regexp_count(c, lit(re)).cast("long")

  def piiCountSql(e: String, re: String): String =
    s"CAST(len(regexp_extract_all($e, '$re')) AS BIGINT)"

  /** Generalize a numeric to its bucket lower bound (k-anonymity coarsening):
    * floor(c / width) * width as BIGINT. Exact for |c| well under 2^52. */
  def generalize(c: Column, width: Long): Column =
    (floor(c / width) * width).cast("long")

  def generalizeSql(e: String, width: Long): String =
    s"CAST(FLOOR(($e) / $width) AS BIGINT) * $width"
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String/identity normalization + hashing (SURVEY.md §2.8 M1, M5, M6).
  *
  * Reference: `/root/reference/data_pipeline/customer_matching.py:19-101`
  * (email/phone/name normalizers) and `customer_flags_config.py:58-132`
  * (md5-based A/B grouping). All pure column expressions — codegen'd, no UDFs.
  */
object Normalize {

  /** M1: lowercase, trim, collapse internal whitespace. */
  def normText(c: Column): Column = regexp_replace(trim(lower(c)), "\\s+", " ")

  def normTextSql(e: String): String = s"regexp_replace(trim(lower($e)), '\\s+', ' ', 'g')"

  /** M1: strip every non-alphanumeric (phone/name canonical form). */
  def alnumOnly(c: Column): Column = regexp_replace(lower(c), "[^a-z0-9]", "")

  def alnumOnlySql(e: String): String = s"regexp_replace(lower($e), '[^a-z0-9]', '', 'g')"

  /** M5: md5-based stable A/B split — last hex digit of md5, mod `groups`.
    * Identical bytes→digest in JVM and C, so this is engine-portable. */
  def abGroup(c: Column, groups: Int = 10): Column =
    (conv(substring(md5(c), 32, 1), 16, 10).cast("long") % groups).cast("long")

  def abGroupSql(e: String, groups: Int = 10): String =
    s"CAST(CAST(('0x' || substr(md5($e), 32, 1)) AS BIGINT) % $groups AS BIGINT)"

  /** M6: Levenshtein similarity ratio in [0,1]. */
  def levRatio(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") / greatest(length(a), length(b)).cast("double")

  def levRatioSql(a: String, b: String): String =
    s"1.0 - CAST(levenshtein($a, $b) AS DOUBLE) / CAST(greatest(length($a), length($b)) AS DOUBLE)"
}

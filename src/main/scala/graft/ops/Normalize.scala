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

  /** Stable hash bucket over `buckets` values — the first 8 md5 hex chars
    * (32 bits, far above any practical bucket count) mod `buckets`.
    * Engine-portable like [[abGroup]]: identical bytes→digest everywhere. */
  def hashBucket(c: Column, buckets: Int): Column =
    (conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets).cast("long")

  def hashBucketSql(e: String, buckets: Int): String =
    s"CAST(CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT) % $buckets AS BIGINT)"

  /** Common TLD typo → correction, the reference's DOMAIN_TYPO_CORRECTIONS
    * (`customer_matching.py:131-160`). */
  val TldTypos: Seq[(String, String)] = Seq(
    "con" -> "com", "cmo" -> "com", "ocm" -> "com", "om" -> "com",
    "comm" -> "com", "xom" -> "com", "vom" -> "com",
    "og" -> "org", "ogr" -> "org", "rog" -> "org",
    "ner" -> "net", "nte" -> "net", "met" -> "net",
    "eud" -> "edu", "deu" -> "edu")

  /** Fix common TLD typos in an email domain (`fix_domain_typo`,
    * `customer_matching.py:162-196`): split at the last dot, map the TLD
    * through the typo table, keep anything unrecognized as-is. Pure codegen
    * column expression — a map literal lookup, no UDF. */
  def fixDomainTypos(domain: Column): Column = {
    val d = lower(domain)
    val base = regexp_extract(d, "^(.*)\\.([^.]+)$", 1)
    val tld = regexp_extract(d, "^(.*)\\.([^.]+)$", 2)
    val fixed = coalesce(
      element_at(typedLit(TldTypos.toMap), tld), tld)
    when(tld === "", d).otherwise(concat(base, lit("."), fixed))
  }

  def fixDomainTyposSql(e: String): String = {
    val cases = TldTypos.map { case (t, c) => s"WHEN '$t' THEN '$c'" }.mkString(" ")
    s"""CASE WHEN regexp_extract(lower($e), '^(.*)\\.([^.]+)$$', 2) = ''
       | THEN lower($e)
       | ELSE regexp_extract(lower($e), '^(.*)\\.([^.]+)$$', 1) || '.' ||
       |   (CASE regexp_extract(lower($e), '^(.*)\\.([^.]+)$$', 2) $cases
       |    ELSE regexp_extract(lower($e), '^(.*)\\.([^.]+)$$', 2) END)
       | END""".stripMargin.replaceAll("\n", " ")
  }

  /** M6: Levenshtein similarity ratio in [0,1]. */
  def levRatio(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") / greatest(length(a), length(b)).cast("double")

  def levRatioSql(a: String, b: String): String =
    s"1.0 - CAST(levenshtein($a, $b) AS DOUBLE) / CAST(greatest(length($a), length($b)) AS DOUBLE)"
}

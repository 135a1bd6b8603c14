package graft.queries

import graft.core.Tables
import graft.ops.Anonymize
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy / anonymization queries (training data derived from user records
  * must not leak identities — BASELINE north star adjunct to the text ops). */
object PrivacyQs {

  val qs: Seq[Q] = Seq(

    // U5: anonymized customer export — salted-md5 pseudonym (stable join
    // key), digit redaction in free text, and k-anonymity over the
    // (nation, balance-bucket) quasi-identifier: generalize the balance to
    // its 1000-wide bucket, then suppress the quasi-identifier wherever the
    // group has fewer than k=5 members. The group-size pass is one window
    // over the quasi-identifier key — hash-partitioned, no join, no
    // single-partition ordering.
    Q("u5_anonymize",
      (s, d) => {
        val w = Window.partitionBy(col("c_nationkey"), col("bal_bucket"))
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            Anonymize.generalize(col("c_acctbal"), 1000L).as("bal_bucket"))
          .withColumn("group_n", count(lit(1)).over(w))
          .withColumn("suppressed", col("group_n") < 5)
          .select(
            Anonymize.pseudonym(col("c_custkey"), "graft").as("pseudo_id"),
            Anonymize.redactDigits(col("c_name")).as("name_redacted"),
            when(col("suppressed"), lit(null).cast("int"))
              .otherwise(col("c_nationkey")).as("nation_out"),
            when(col("suppressed"), lit(null).cast("long"))
              .otherwise(col("bal_bucket")).as("bal_bucket_out"),
            col("group_n"), col("suppressed"))
      },
      Some(s"""WITH g AS (
              |  SELECT c_custkey, c_name, c_nationkey,
              |    ${Anonymize.generalizeSql("c_acctbal", 1000L)} AS bal_bucket
              |  FROM customer),
              |w AS (SELECT *,
              |  COUNT(*) OVER (PARTITION BY c_nationkey, bal_bucket) AS group_n
              |  FROM g)
              |SELECT ${Anonymize.pseudonymSql("c_custkey", "graft")} AS pseudo_id,
              |  ${Anonymize.redactDigitsSql("c_name")} AS name_redacted,
              |  CASE WHEN group_n < 5 THEN NULL ELSE c_nationkey END AS nation_out,
              |  CASE WHEN group_n < 5 THEN NULL ELSE bal_bucket END AS bal_bucket_out,
              |  group_n, group_n < 5 AS suppressed
              |FROM w""".stripMargin)),

    // U6: PII scrubbing — the free-text redaction pass a training corpus
    // gets before packing. No table ships PII, so the contact blob is
    // SYNTHESIZED deterministically from customer columns on BOTH sides;
    // the operator under test is the scrubber (email → <EMAIL>, phone →
    // <PHONE>, residual >= 3-digit runs → ###, in that order) plus the
    // detection counts. Pure row-local codegen — scan-speed at 100 TB.
    Q("u6_pii_scrub",
      (s, d) => {
        val blob = concat(
          lit("reach "), col("c_name"), lit(" at user"),
          col("c_custkey").cast("string"), lit("@mail-"),
          lower(col("c_mktsegment")), lit(".example or +1-555-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
          lit(" ref "), col("c_nationkey").cast("string"))
        Tables.customer(s, d)
          .withColumn("contact", blob)
          .select(col("c_custkey"),
            Anonymize.scrubPii(col("contact")).as("scrubbed"),
            Anonymize.piiCount(col("contact"), Anonymize.EmailRe).as("n_emails"),
            Anonymize.piiCount(col("contact"), Anonymize.PhoneRe).as("n_phones"))
      },
      Some {
        val blob = """'reach ' || c_name || ' at user' || c_custkey || '@mail-' ||
                     |  lower(c_mktsegment) || '.example or +1-555-' ||
                     |  lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') || ' ref ' || c_nationkey""".stripMargin
        s"""WITH t AS (SELECT c_custkey, $blob AS contact FROM customer)
           |SELECT c_custkey, ${Anonymize.scrubPiiSql("contact")} AS scrubbed,
           |  ${Anonymize.piiCountSql("contact", Anonymize.EmailRe)} AS n_emails,
           |  ${Anonymize.piiCountSql("contact", Anonymize.PhoneRe)} AS n_phones
           |FROM t""".stripMargin
      })
  )
}

package graft.queries

import org.apache.spark.sql.functions._

/** DQ1 — the warehouse-health "data questions" mart: customers whose data
  * the pipeline can't resolve automatically, emitted as a CRM review queue.
  *
  * Reference: `build_data_questions.py:20-170` — three question classes
  * over the customer master + family links + checkins: (Q1) active
  * children with unresolved/ambiguous parentage, (Q2) reachable leads that
  * never entered a mail flow (capped at 50), (Q3) lapsed members never
  * contacted by crew.
  *
  * Q1 is re-grounded in the engine's own family-evidence model: the
  * reference matches child surnames against adults-with-email; here the
  * equivalent ambiguity signal is fam1's edge disagreement — a child whose
  * BEHAVIORAL edges (reservation-slot owner, shared-checkin adult) point at
  * parents other than the relations-dim parent needs a human call
  * (`ambiguous_parent`), and a child-shaped key with no relations link at
  * all is `missing_parent` (rare by construction in a contiguous key
  * universe, but the class the reference's Q1 names).
  *
  * Scale shape: one pass over the wide master (checkpointed — three
  * question branches consume it), the behavioral edge union re-uses fam1's
  * blocked derivations (slot-keyed equi-join + bucketed proximity), and
  * every branch is a filter + key-partitioned aggregate; the only global
  * order is Q2's reference-mandated deterministic 50-row cap (a top-k, not
  * a sort of the corpus).
  */
object DataQuestions {

  val qs: Seq[Q] = Seq(
    Q("dq1_data_questions",
      (s, d) => {
        // narrow eager checkpoint: three branches consume the master
        val cm = CustomerMaster.master(s, d).localCheckpoint(true)

        // Q1: family-evidence questions over active child-shaped keys
        val beh = FamilyEdges.reservationEdges(s, d)
          .unionByName(FamilyEdges.checkinEdges(s, d))
          .select(col("parent_customer_id").as("b_parent"),
            col("child_customer_id").as("b_child"))
        val kids = cm.filter(col("customer_id") % 10 >= 8 &&
            col("total_visits") > 0)
          .select(col("customer_id"), col("name"), col("is_child"),
            col("parent_customer_id"), col("total_visits"))
        val q1 = kids
          .join(beh, col("customer_id") === col("b_child"), "left")
          .withColumn("disagree", col("b_parent").isNotNull &&
            (col("parent_customer_id").isNull ||
              col("b_parent") =!= col("parent_customer_id")))
          .groupBy(col("customer_id"), col("name"), col("is_child"),
            col("total_visits"))
          .agg(countDistinct(when(col("disagree"), col("b_parent")))
            .as("n_cand"))
          .filter(!col("is_child") || col("n_cand") >= 1)
          .select(col("customer_id"), col("name").as("customer_name"),
            when(!col("is_child"), "missing_parent")
              .otherwise("ambiguous_parent").as("question_type"),
            when(!col("is_child"),
                when(col("total_visits") >= 3, "high").otherwise("medium"))
              .otherwise("medium").as("priority"),
            col("n_cand").as("n_candidates"), col("total_visits"))

        // Q2: reachable leads never in a mail flow — deterministic 50 cap
        // (the reference's head(50)), smallest keys first. Priority rides
        // ORDER volume, not visits: in this event model zero-Klaviyo leads
        // are exactly the no-event lapsed class (every visiting user
        // receives views), so the reference's visit-count priority signal
        // is re-grounded on the ledger that actually has volume for them.
        val q2 = cm.filter(col("is_lead") && col("contact_email").isNotNull &&
            col("klaviyo_emails_received") === 0)
          .orderBy(col("customer_id")).limit(50)
          .select(col("customer_id"), col("name").as("customer_name"),
            lit("no_klaviyo").as("question_type"),
            when(col("n_orders") >= 5, "high").otherwise("medium")
              .as("priority"),
            lit(null).cast("long").as("n_candidates"), col("total_visits"))

        // Q3: lapsed members never contacted by crew
        val q3 = cm.filter(col("is_lapsed_member") &&
            !col("has_been_contacted") && col("contact_email").isNotNull)
          .select(col("customer_id"), col("name").as("customer_name"),
            lit("lapsed_no_contact").as("question_type"),
            lit("medium").as("priority"),
            lit(null).cast("long").as("n_candidates"), col("total_visits"))

        q1.unionByName(q2).unionByName(q3)
      },
      Some(
        s"""WITH cm AS (${CustomerMaster.masterSql}),
           |${FamilyEdges.behavioralSqlCtes},
           |beh AS (
           |  SELECT parent_customer_id AS b_parent,
           |         child_customer_id AS b_child
           |  FROM (SELECT parent_customer_id, child_customer_id FROM res
           |        UNION ALL
           |        SELECT parent_customer_id, child_customer_id FROM prox)),
           |q1 AS (
           |  SELECT customer_id, customer_name,
           |    CASE WHEN NOT is_child THEN 'missing_parent'
           |         ELSE 'ambiguous_parent' END AS question_type,
           |    CASE WHEN NOT is_child THEN
           |           CASE WHEN total_visits >= 3 THEN 'high' ELSE 'medium' END
           |         ELSE 'medium' END AS priority,
           |    n_cand AS n_candidates, total_visits
           |  FROM (
           |    SELECT cm.customer_id, cm.name AS customer_name, cm.is_child,
           |      cm.total_visits,
           |      CAST(COUNT(DISTINCT CASE WHEN b.b_parent IS NOT NULL
           |        AND (cm.parent_customer_id IS NULL
           |             OR b.b_parent <> cm.parent_customer_id)
           |        THEN b.b_parent END) AS BIGINT) AS n_cand
           |    FROM cm LEFT JOIN beh b ON cm.customer_id = b.b_child
           |    WHERE cm.customer_id % 10 >= 8 AND cm.total_visits > 0
           |    GROUP BY 1, 2, 3, 4)
           |  WHERE NOT is_child OR n_cand >= 1),
           |q2 AS (
           |  SELECT customer_id, name AS customer_name,
           |    'no_klaviyo' AS question_type,
           |    CASE WHEN n_orders >= 5 THEN 'high' ELSE 'medium' END
           |      AS priority,
           |    CAST(NULL AS BIGINT) AS n_candidates, total_visits
           |  FROM cm
           |  WHERE is_lead AND contact_email IS NOT NULL
           |    AND klaviyo_emails_received = 0
           |  ORDER BY customer_id LIMIT 50),
           |q3 AS (
           |  SELECT customer_id, name AS customer_name,
           |    'lapsed_no_contact' AS question_type,
           |    'medium' AS priority,
           |    CAST(NULL AS BIGINT) AS n_candidates, total_visits
           |  FROM cm
           |  WHERE is_lapsed_member AND NOT has_been_contacted
           |    AND contact_email IS NOT NULL)
           |SELECT * FROM q1
           |UNION ALL SELECT * FROM q2
           |UNION ALL SELECT * FROM q3""".stripMargin))
  )
}

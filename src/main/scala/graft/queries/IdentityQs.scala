package graft.queries

import graft.core.Tables
import graft.ops.Identity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Identity resolution as a declared query: fuzzy-matched customer↔supplier
  * records clustered into components; canonical id = component minimum
  * (deterministic first-seen-wins replacement, SURVEY.md §7.4). Oracle:
  * DuckDB recursive transitive closure over the same edge set. */
object IdentityQs {

  /** Supplier node-id offset (2^40): keeps the supplier id space disjoint
    * from customer keys at ANY scale factor — a 100k offset collides once
    * customers exceed 100k rows (sf >= 1), silently fusing unrelated
    * components in a way the oracle (sharing the offset) cannot catch. */
  private val SupplierIdBase = 1L << 40

  /** FastSS deletion-neighborhood key: two strings within lev <= 1 ALWAYS
    * share a member of their deletion-1 neighborhoods (substitution: both
    * delete the differing position; insertion: the longer's deletion IS the
    * shorter; equal: the string itself, the i = len case), so a join keyed
    * on (block, variant) still covers every qualifying pair and the exact
    * lev filter decides — output bit-identical to the plain block join, the
    * oracle keeps the plain spelling (a cross-algorithm completeness check,
    * the gr2 discipline). WITHOUT the variant key a block join is a
    * per-block cross — u2's was 15,000 × 1,000 per block at sf10 (1.5B lev
    * calls, measured killing the context at 100×), and u2b's 300 coarse
    * (suffix, domain) blocks measured 17.4× wall for 10× data before the
    * variant key landed there too (n²/300 candidates: 5M at sf1, 500M at
    * sf10). Pair up with distinct(): a pair can share several variants
    * (identical nums share all len+1). */
  private def delVars(numCol: String) = explode(expr(
    s"""transform(sequence(0, length($numCol)),
       |  i -> concat(substring($numCol, 1, i),
       |              substring($numCol, i + 2, 1000000)))""".stripMargin))

  // Shared edge definition: block on suffix-number % 100, link when the
  // 9-digit suffixes are within levenshtein 1. Suppliers offset to a disjoint
  // id space.
  private val edgeSqlCte =
    """edges_raw AS (
      |  SELECT c_custkey AS src, 1099511627776 + s_suppkey AS dst
      |  FROM customer JOIN supplier
      |    ON CAST(regexp_extract(c_name, '#([0-9]+)', 1) AS BIGINT) % 100
      |     = CAST(regexp_extract(s_name, '#([0-9]+)', 1) AS BIGINT) % 100
      |  WHERE levenshtein(regexp_extract(c_name, '#([0-9]+)', 1),
      |                    regexp_extract(s_name, '#([0-9]+)', 1)) <= 1),
      |edges AS (
      |  SELECT src, dst FROM edges_raw
      |  UNION
      |  SELECT dst, src FROM edges_raw)""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("u2_identity_components",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_custkey").as("id"),
            regexp_extract(col("c_name"), "#([0-9]+)", 1).as("num"))
        val sup = Tables.supplier(s, d)
          .select((col("s_suppkey") + SupplierIdBase).as("id"),
            regexp_extract(col("s_name"), "#([0-9]+)", 1).as("num"))
        val edges = c.select(col("id").as("src"), col("num").as("src_num"),
            (col("num").cast("long") % 100).as("blk"), delVars("num").as("dv"))
          .join(sup.select(col("id").as("dst"), col("num").as("dst_num"),
            (col("num").cast("long") % 100).as("blk"), delVars("num").as("dv")),
            Seq("blk", "dv"))
          .filter(levenshtein(col("src_num"), col("dst_num")) <= 1)
          .select(col("src"), col("dst")).distinct()
        val nodes = c.select(col("id")).unionByName(sup.select(col("id")))
        val comps = Identity.connectedComponents(nodes, edges)
        comps.withColumn("comp_size",
          count(lit(1)).over(Window.partitionBy(col("comp_id"))))
          .select(col("id").as("node_id"), col("comp_id"), col("comp_size"))
      },
      Some(s"""WITH RECURSIVE
              |$edgeSqlCte,
              |nodes AS (
              |  SELECT c_custkey AS id FROM customer
              |  UNION ALL SELECT 1099511627776 + s_suppkey FROM supplier),
              |reach(id, r) AS (
              |  SELECT id, id FROM nodes
              |  UNION
              |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
              |comps AS (SELECT id, MIN(r) AS comp_id FROM reach GROUP BY id)
              |SELECT id AS node_id, comp_id,
              |  COUNT(*) OVER (PARTITION BY comp_id) AS comp_size
              |FROM comps""".stripMargin),
      // promoted round 9: the warehouse's heaviest iterative job
      // (identity_map was the EP1 sf10 tail) belongs on the driver's clock
      bench = true),

    // U2b: the FUZZY identity pass — edges require the normalized email
    // domains to match after TLD-typo correction (gmail.con == gmail.com),
    // in addition to the near-identical local part; blocking on
    // (suffix % 100, fixed domain) keeps candidate pairs bounded. Reference:
    // typo map + domain-tolerant match `customer_matching.py:104-208,432-445`.
    // Deterministic tie-break: canonical id = component minimum, as in u2.
    Q("u2b_identity_fuzzy",
      (s, d) => {
        import graft.ops.Normalize
        def domain(key: org.apache.spark.sql.Column, typoSet: Int) = {
          val m = key % 10
          if (typoSet == 0)
            when(m <= 3, lit("gmail.com")).when(m === 4, lit("gmail.con"))
              .when(m <= 7, lit("climb.org")).when(m === 8, lit("climb.og"))
              .otherwise(lit("yahoo.net"))
          else
            when(m <= 3, lit("gmail.com")).when(m === 4, lit("gmail.cmo"))
              .when(m <= 7, lit("climb.ogr")).when(m === 8, lit("climb.org"))
              .otherwise(lit("yahoo.met"))
        }
        val c = Tables.customer(s, d)
          .select(col("c_custkey").as("id"),
            regexp_extract(col("c_name"), "#([0-9]+)", 1).as("num"),
            Normalize.fixDomainTypos(domain(col("c_custkey"), 0)).as("dom"))
        // supplier domains key off the TENS digit — edge pairs share the last
        // digit (lev<=1 within a %100 block can only differ in higher
        // digits), so a last-digit-keyed domain would never prune; the tens
        // digit makes the domain gate (and its typo correction) decide which
        // supplier×customer links survive
        val sup = Tables.supplier(s, d)
          .select((col("s_suppkey") + SupplierIdBase).as("id"),
            regexp_extract(col("s_name"), "#([0-9]+)", 1).as("num"),
            Normalize.fixDomainTypos(
              domain(floor(col("s_suppkey") / 10).cast("long"), 1)).as("dom"))
        // (blk, dom, deletion-variant) key — see delVars: without it the
        // 300 coarse (suffix, domain) blocks are a per-block cross
        val edges = c.select(col("id").as("src"), col("num").as("src_num"),
            (col("num").cast("long") % 100).as("blk"), col("dom"),
            delVars("num").as("dv"))
          .join(sup.select(col("id").as("dst"), col("num").as("dst_num"),
            (col("num").cast("long") % 100).as("blk"), col("dom"),
            delVars("num").as("dv")), Seq("blk", "dom", "dv"))
          .filter(levenshtein(col("src_num"), col("dst_num")) <= 1)
          .select(col("src"), col("dst")).distinct()
        val nodes = c.select(col("id")).unionByName(sup.select(col("id")))
        Identity.connectedComponents(nodes, edges)
          .withColumn("comp_size",
            count(lit(1)).over(Window.partitionBy(col("comp_id"))))
          .select(col("id").as("node_id"), col("comp_id"), col("comp_size"))
      },
      Some {
        import graft.ops.Normalize
        def domSql(key: String, typoSet: Int) =
          if (typoSet == 0)
            s"""CASE WHEN $key % 10 <= 3 THEN 'gmail.com'
               | WHEN $key % 10 = 4 THEN 'gmail.con'
               | WHEN $key % 10 <= 7 THEN 'climb.org'
               | WHEN $key % 10 = 8 THEN 'climb.og'
               | ELSE 'yahoo.net' END""".stripMargin.replaceAll("\n", " ")
          else
            s"""CASE WHEN $key % 10 <= 3 THEN 'gmail.com'
               | WHEN $key % 10 = 4 THEN 'gmail.cmo'
               | WHEN $key % 10 <= 7 THEN 'climb.ogr'
               | WHEN $key % 10 = 8 THEN 'climb.org'
               | ELSE 'yahoo.met' END""".stripMargin.replaceAll("\n", " ")
        s"""WITH RECURSIVE
           |c AS (
           |  SELECT c_custkey AS id, regexp_extract(c_name, '#([0-9]+)', 1) AS num,
           |    ${Normalize.fixDomainTyposSql(domSql("c_custkey", 0))} AS dom
           |  FROM customer),
           |s AS (
           |  SELECT 1099511627776 + s_suppkey AS id, regexp_extract(s_name, '#([0-9]+)', 1) AS num,
           |    ${Normalize.fixDomainTyposSql(domSql("(s_suppkey // 10)", 1))} AS dom
           |  FROM supplier),
           |edges_raw AS (
           |  SELECT c.id AS src, s.id AS dst
           |  FROM c JOIN s
           |    ON CAST(c.num AS BIGINT) % 100 = CAST(s.num AS BIGINT) % 100
           |   AND c.dom = s.dom
           |  WHERE levenshtein(c.num, s.num) <= 1),
           |edges AS (
           |  SELECT src, dst FROM edges_raw
           |  UNION
           |  SELECT dst, src FROM edges_raw),
           |nodes AS (
           |  SELECT id FROM c UNION ALL SELECT id FROM s),
           |reach(id, r) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
           |comps AS (SELECT id, MIN(r) AS comp_id FROM reach GROUP BY id)
           |SELECT id AS node_id, comp_id,
           |  COUNT(*) OVER (PARTITION BY comp_id) AS comp_size
           |FROM comps""".stripMargin
      }),

    // U2c: sorted-neighborhood blocking (SNM, Hernández & Stolfo '95) — the
    // SORT-ORDER blocking family next to u2b's derived-key equality blocks:
    // rank the contact emails under one global (key, id) order, pair
    // everything within 4 rank positions, verify with edit distance.
    // Near-identical keys no equality block shares (an off-by-one customer
    // number, a shared-email duplicate) sort adjacently and are caught;
    // candidates are O(n·w) by construction regardless of key skew. The
    // rank is the two-level order-preserving shard sum (no global sort
    // window) — Identity.sortedNeighborhoodPairs.
    Q("u2c_sorted_neighborhood",
      (s, d) => {
        val recs = Tables.customer(s, d)
          .select(col("c_custkey").cast("long").as("id"),
            CustomerMaster.synthEmail.as("email"))
        Identity.sortedNeighborhoodPairs(recs, "id", "email",
            window = 4, buckets = 64)
          .withColumn("lev", levenshtein(col("key_a"), col("key_b")).cast("long"))
          .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
            col("rank_a"), col("rank_b"), col("lev"),
            (col("lev") <= 1).as("is_match"))
      },
      Some(s"""WITH recs AS (
              |  SELECT CAST(c_custkey AS BIGINT) AS id,
              |    ${CustomerMaster.synthEmailSql} AS email
              |  FROM customer),
              |ranked AS (
              |  SELECT id, email,
              |    CAST(row_number() OVER (ORDER BY email, id) AS BIGINT) AS rnk
              |  FROM recs WHERE email IS NOT NULL)
              |SELECT a.id AS id_a, b.id AS id_b,
              |  a.email AS key_a, b.email AS key_b,
              |  a.rnk AS rank_a, b.rnk AS rank_b,
              |  CAST(levenshtein(a.email, b.email) AS BIGINT) AS lev,
              |  levenshtein(a.email, b.email) <= 1 AS is_match
              |FROM ranked a JOIN ranked b
              |  ON b.rnk > a.rnk AND b.rnk <= a.rnk + 4""".stripMargin))
  )
}

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

  // Shared edge definition: block on suffix-number % 100, link when the
  // 9-digit suffixes are within levenshtein 1. Suppliers offset to a disjoint
  // id space.
  private val edgeSqlCte =
    """edges_raw AS (
      |  SELECT c_custkey AS src, 100000 + s_suppkey AS dst
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
          .select((col("s_suppkey") + 100000L).as("id"),
            regexp_extract(col("s_name"), "#([0-9]+)", 1).as("num"))
        val edges = c.select(col("id").as("src"), col("num").as("src_num"),
            (col("num").cast("long") % 100).as("blk"))
          .join(sup.select(col("id").as("dst"), col("num").as("dst_num"),
            (col("num").cast("long") % 100).as("blk")), Seq("blk"))
          .filter(levenshtein(col("src_num"), col("dst_num")) <= 1)
          .select(col("src"), col("dst"))
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
              |  UNION ALL SELECT 100000 + s_suppkey FROM supplier),
              |reach(id, r) AS (
              |  SELECT id, id FROM nodes
              |  UNION
              |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
              |comps AS (SELECT id, MIN(r) AS comp_id FROM reach GROUP BY id)
              |SELECT id AS node_id, comp_id,
              |  COUNT(*) OVER (PARTITION BY comp_id) AS comp_size
              |FROM comps""".stripMargin))
  )
}

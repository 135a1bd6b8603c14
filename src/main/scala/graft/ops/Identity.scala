package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Identity resolution (SURVEY.md §2.9 U2, §7.4 hard part #1).
  *
  * The reference resolves identity with an order-dependent fold: iterate
  * records, match each against a growing in-memory email/phone index, else
  * mint a UUID (`/root/reference/data_pipeline/customer_matching.py:211-481`).
  * That cannot distribute. Re-architected set-based: normalize identifiers →
  * build match EDGES (exact-key equality and/or blocked fuzzy similarity) →
  * connected components → the component's minimum id is the canonical id.
  * "First-seen-wins" becomes the deterministic "minimum id wins" tie-break
  * (§7.4: pin determinism, validate by scenario rather than bit-parity).
  *
  * Components are computed by iterative min-label propagation: each round
  * every node takes the min label among itself and its neighbors — O(diameter)
  * distributed rounds, each a shuffle-join, with localCheckpoint to keep the
  * plan from growing. Identity graphs are near-bipartite clusters with tiny
  * diameter, so this converges in a handful of rounds at any scale.
  * For general topologies (where diameter can be O(n)) use
  * [[Graph.connectedComponentsStar]] — O(log n) rounds on any graph, same
  * min-id contract (gr2 proves agreement on the near-dup graph).
  */
object Identity extends org.apache.spark.internal.Logging {

  /** Connected components over undirected `edges` (src, dst) covering `nodes`
    * (id). Returns (id, comp_id) with comp_id = min node id in the component. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = nodes.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und.join(labels, und("src") === labels("id"))
        .groupBy(und("dst").as("nbr_id")).agg(min(col("comp")).as("nbr_comp"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("nbr_id"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("nbr_comp"), labels("comp"))).as("comp"))
        .localCheckpoint(true)
      val changed = updated.as("u").join(labels.as("l"), "id")
        .filter(col("u.comp") =!= col("l.comp")).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    if (!converged) logWarning(
      s"connectedComponents did not converge within $maxIter iterations — " +
        "labels are an upper bound, not the fixpoint; raise maxIter")
    labels.withColumnRenamed("comp", "comp_id")
  }

  /** Resolve records into identity clusters by exact shared identifiers.
    * `identifiers`: (record_id, id_value) — pre-normalized (Normalize.normText
    * / alnumOnly). Records sharing any id_value land in one component. */
  def resolveByExactKeys(identifiers: DataFrame): DataFrame = {
    val nodes = identifiers.select(col("record_id").as("id")).distinct()
    // Edge via the identifier hub: star topology (min record per value <-> others)
    // keeps edge count linear in records, not quadratic per shared value.
    val hubs = identifiers.groupBy(col("id_value")).agg(min(col("record_id")).as("hub"))
    val edges = identifiers.join(hubs, Seq("id_value"))
      .filter(col("record_id") =!= col("hub"))
      .select(col("hub").as("src"), col("record_id").as("dst"))
    connectedComponents(nodes, edges)
  }
}

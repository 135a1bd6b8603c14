package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-iteration graph algorithms over (src, dst) edge frames.
  *
  * Companion to [[Identity.connectedComponents]] (min-label propagation):
  * same execution discipline — each round is one shuffle join + one
  * map-side-combinable aggregation, with an eager `localCheckpoint` per
  * round so the plan stays round-sized instead of growing a K-deep lineage.
  */
object Graph {

  /** PageRank with damping 0.85 over a directed edge list, in EXACT integer
    * fixed-point arithmetic: ranks are BIGINT units of 1e-12 ("rank_e12", a
    * total mass of ~1e12 spread over the nodes), every division is integer
    * floor division, so the result is bit-identical across engines and
    * partitionings — a SQL oracle can replay the K rounds exactly, the same
    * portability contract as the repo's md5 hashing and decimal sums.
    * (Floor truncation loses < 1e-12 of mass per term — ranking-irrelevant,
    * and the price of an exactly-verifiable iterative operator.)
    *
    * Per round, for every node v:
    * r'(v) = (0.15e12 div N) + Σ_{u→v} (r(u) * 85) div (100 * deg(u)).
    * Nodes with no out-edges leak their damped mass (the standard
    * sink-loss simplification — symmetrized graphs have none).
    *
    * Scale shape: the node/edge frames are shuffled on node id each round
    * (K rounds = K join+agg stages, K fixed and small); contribution sums
    * combine map-side; rank state is node-sized, never edge-sized. The node
    * count enters as a 1-row broadcast (the a6/t15 pattern), not a driver
    * collect. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 8): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ewd = e.join(deg, "src").localCheckpoint(true) // (src, dst, deg)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val base = nodes.crossJoin(broadcast(nn)).localCheckpoint(true)
    var ranks = base
      .select(col("node"), col("n"),
        expr("CAST(1000000000000 AS BIGINT) div n").as("r"))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      val contrib = ewd
        .join(ranks.select(col("node"), col("r")), ewd("src") === col("node"))
        .groupBy(col("dst").as("cnode"))
        .agg(sum(expr("(r * 85) div (100 * deg)")).as("c"))
      ranks = base.join(contrib, base("node") === contrib("cnode"), "left")
        .select(base("node"), base("n"),
          (expr("CAST(150000000000 AS BIGINT) div n") +
            coalesce(col("c"), lit(0L))).as("r"))
      // checkpoint every 4th round: a four-round plan is still bounded
      // (shallower than the native as-of join trees), and each eager
      // materialization is a fixed scheduler cost that dominated wall-clock
      // when checkpointing per round (the result is integer-exact at any
      // placement — checkpoints cannot change the arithmetic)
      if (i % 4 == 0 || i == iters) ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_e12"))
  }
}

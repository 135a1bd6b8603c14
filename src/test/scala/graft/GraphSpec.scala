package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference with the identical integer fixed-point math. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    var r = nodes.map(v => v -> 1000000000000L / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => (r(u) * 85L) / (100L * deg(u)) }.sum).toMap
      r = nodes.map(v => v -> (150000000000L / n + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the driver-side reference on a hand graph") {
    // star: 1 -> {2,3,4}, all -> 1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
    val got = run(edges, 8, 3)
    assert(got == refPageRank(edges, 8))
    // hub 1 outranks the leaves and leaves tie by symmetry
    assert(got(1L) > got(2L) && got(2L) == got(3L) && got(3L) == got(4L))
  }

  test("matches the reference on random graphs and is partition-invariant") {
    for (seed <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 120).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2).distinct
      val want = refPageRank(edges, 6)
      assert(run(edges, 6, 2) == want, s"seed=$seed")
      assert(run(edges, 6, 7) == want, s"seed=$seed parts=7")
    }
  }

  /** Driver-side PPR reference with the identical integer fixed-point math. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val s = nodes.filter(seeds).toSet
    val ns = s.size.toLong
    var r = nodes.map(v => v -> (if (s(v)) 1000000000000L / ns else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => (r(u) * 85L) / (100L * deg(u)) }.sum).toMap
      r = nodes.map(v => v ->
        ((if (s(v)) 150000000000L / ns else 0L) + contrib.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def runPpr(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int,
      parts: Int): Map[Long, Long] =
    Graph.personalizedPageRank(edges.toDF("src", "dst").repartition(parts),
        seeds.toDF("user_id"), "src", "dst", "user_id", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("personalizedPageRank matches the reference and is partition-invariant") {
    for (seed <- Seq(3, 4)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 120).map(_ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2).distinct
      val seedIds = Seq(0L, 1L, 2L)
      val want = refPpr(edges, seedIds.toSet, 6)
      assert(runPpr(edges, seedIds, 6, 2) == want, s"seed=$seed")
      assert(runPpr(edges, seedIds, 6, 7) == want, s"seed=$seed parts=7")
    }
  }

  test("personalizedPageRank: mass concentrates near the seed, far nodes get less") {
    // path 1-2-3-4-5 (symmetrized), seed at 1. Strict per-hop monotonicity
    // does NOT hold at the tail (deg(5)=1 bounces ALL its damped mass back
    // to 4, so 5 can outrank 4) — assert what the walk guarantees: the seed
    // dominates, near (2,3) beats far (4,5).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = pairs ++ pairs.map(_.swap)
    val got = runPpr(edges, Seq(1L), 8, 3)
    assert(got(1L) == got.values.max, s"got=$got")
    assert(Seq(2L, 3L).map(got).min > Seq(4L, 5L).map(got).max, s"got=$got")
    // seeds outside the graph's node set dilute nothing (6 has no edges)
    assert(runPpr(edges, Seq(1L, 6L), 8, 3) == got)
  }

  test("personalizedPageRank rejects a seed set disjoint from the graph") {
    val edges = Seq((1L, 2L), (2L, 1L))
    assertThrows[IllegalArgumentException] {
      runPpr(edges, Seq(9L), 4, 2)
    }
  }

  test("total mass stays within floor-truncation loss of 1e12 on a symmetric graph") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = pairs ++ pairs.map(_.swap)
    val total = run(edges, 8, 4).values.sum
    // every node has out-edges, so only integer-floor dust is lost
    assert(total <= 1000000000000L && total > 999999990000L, s"total=$total")
  }

  private def starCC(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 20): Map[Long, Long] =
    Graph.connectedComponentsStar(nodes.toDF("id"),
        edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side union-find reference. */
  private def refCC(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(v => v -> find(v)).toMap
  }

  test("connectedComponentsStar equals union-find and min-label propagation") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val nodes = (1L to 60L)
      val edges = Seq.fill(50)((rnd.nextInt(60) + 1L, rnd.nextInt(60) + 1L))
        .filter(e => e._1 != e._2)
      val want = refCC(nodes, edges)
      assert(starCC(nodes, edges) == want, s"trial=$trial vs union-find")
      val prop = graft.ops.Identity.connectedComponents(
          nodes.toDF("id"), edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == want, s"trial=$trial vs propagation")
    }
    // isolated nodes are their own component; empty edge set is fine
    assert(starCC(Seq(7L, 9L), Seq.empty) == Map(7L -> 7L, 9L -> 9L))
  }

  test("star contraction on adversarial topologies: ring, clique, forest, hub") {
    // ring (propagation worst case after the path), one shared component
    val ringN = 128L
    val ring = (0L until ringN).map(i => (i, (i + 1) % ringN))
    assert(starCC(0L until ringN, ring, maxIter = 10) ==
      (0L until ringN).map(_ -> 0L).toMap)
    // clique: densest candidate set, closes immediately
    val k = (0L until 20L)
    val clique = for (a <- k; b <- k if a < b) yield (a, b)
    assert(starCC(k, clique) == k.map(_ -> 0L).toMap)
    // forest of many small components + isolated nodes
    val forest = (0L until 300L by 3).flatMap(i => Seq((i, i + 1), (i + 1, i + 2)))
    val wantF = (0L until 300L).map(i => i -> (i / 3 * 3)).toMap ++
      Map(1000L -> 1000L)
    assert(starCC((0L until 300L) :+ 1000L, forest) == wantF)
    // hub: one node connected to everything (max-degree center)
    val hub = (1L to 200L).map(i => (i, 0L))
    assert(starCC(0L to 200L, hub) == (0L to 200L).map(_ -> 0L).toMap)
  }

  test("star contraction closes a 256-node path in O(log n) rounds") {
    // diameter 255: min-label propagation needs ~255 rounds (its maxIter=25
    // would NOT converge); star contraction must finish in <= 10
    val nodes = (0L until 256L)
    val edges = (0L until 255L).map(i => (i, i + 1))
    val got = starCC(nodes, edges, maxIter = 10) // throws if not converged
    assert(got == nodes.map(_ -> 0L).toMap)
  }

  private def lpa(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int = 4, parts: Int = 5): Map[Long, Long] =
    graft.ops.Graph.labelPropagation(
        nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation cuts the barbell bridge that components merge through") {
    // two triangles joined by ONE bridge edge: one COMPONENT, but the
    // deterministic 4-round LPA (with self-vote) settles each triangle on
    // its own label — the community-vs-component distinction gr3 declares.
    // Hand-replayed: r1 (1,2,3|4,5,6)->(1,1,1|3,4,4),
    // r2 ->(1,1,1|4,4,4), r3/r4 fixed.
    val nodes = (1L to 6L)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val got = lpa(nodes, edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    // same graph, one component under star contraction
    assert(starCC(nodes, edges).values.toSet.size == 1)
  }

  test("labelPropagation self-vote: a 2-node pair converges to min, no oscillation") {
    // without the self-vote, synchronous LPA swaps a pair's labels forever
    // and even-K lands back on the identity — singleton "communities"
    assert(lpa(Seq(7L, 9L), Seq((7L, 9L))) == Map(7L -> 7L, 9L -> 7L))
  }

  test("labelPropagation honors min-label ties on negative and >1e18 ids") {
    // a printf-encoded composite tie-break key misorders both domains:
    // '%020d' of a negative id compares lexicographically backwards, and
    // (1e18 - lbl) underflows past 1e18 — min_by over struct(-cnt, lbl)
    // must pick the SMALLEST label in both regimes
    val big = 3000000000000000000L // > 1e18
    assert(lpa(Seq(big, big + 7), Seq((big, big + 7))) ==
      Map(big -> big, (big + 7) -> big))
    assert(lpa(Seq(-5L, -50L), Seq((-5L, -50L))) ==
      Map(-5L -> -50L, -50L -> -50L))
  }

  test("labelPropagation collapses duplicate node rows instead of double-voting") {
    // nodes [3,3,1,2]: a duplicated node-3 row must NOT double node 3's
    // round-1 vote weight at node 2 — all neighbor votes tie at 1 and the
    // min-label break picks 1
    val got = graft.ops.Graph.labelPropagation(
        Seq(3L, 3L, 1L, 2L).toDF("id"),
        Seq((3L, 2L), (1L, 2L)).toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 3 && got(2L) == 1L)
  }

  test("labelPropagation includes edge endpoints absent from the nodes frame") {
    // universe = nodes ∪ endpoints: node 2 gets a label, a self-vote, and
    // its votes COUNT from round 1 (it is not a silent one-way sink)
    val got = lpa(Seq(1L), Seq((1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("labelPropagation is partitioning-independent and keeps isolated nodes") {
    val rnd = new scala.util.Random(13)
    val nodes = (0L until 60L)
    val edges = (0 until 120).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)).filter(e => e._1 != e._2)
    val a = lpa(nodes, edges, parts = 3)
    val b = lpa(nodes, edges, parts = 11)
    assert(a == b)
    // nodes 50..59 have no edges: they keep their own label
    (50L until 60L).foreach(n => assert(a(n) == n))
  }

  private def kcore(nodes: Seq[Long], edges: Seq[(Long, Long)], k: Int,
      rounds: Int = 3, parts: Int = 5): Map[Long, (Boolean, Long, Boolean)] =
    graft.ops.Graph.kCore(
        nodes.toDF("id").repartition(parts),
        edges.toDF("src", "dst").repartition(parts), k, rounds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("kCore keeps the triangle, peels the pendant chain, and converges") {
    // triangle 1-2-3 with a chain 3-4-5 hanging off: the 2-core is exactly
    // the triangle (every member has 2 surviving neighbors); the chain
    // peels outside-in (5 in round 1, 4 in round 2)
    val got = kcore((1L to 5L), Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L)), k = 2)
    assert(got == Map(
      1L -> ((true, 2L, true)), 2L -> ((true, 2L, true)),
      3L -> ((true, 2L, true)),
      4L -> ((false, 0L, true)), 5L -> ((false, 0L, true))))
  }

  test("kCore reports converged=false when the round budget truncates peeling") {
    // a 6-path needs 3 simultaneous peel rounds to empty under k=2; with
    // rounds=2 the middle pair survives at degree 1 -> NOT converged;
    // with rounds=3 the core is empty and trivially converged
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val cut = kcore((1L to 6L), path, k = 2, rounds = 2)
    assert(cut(3L) == ((true, 1L, false)) && cut(4L) == ((true, 1L, false)))
    val full = kcore((1L to 6L), path, k = 2, rounds = 3)
    assert(full.values.forall(_ == ((false, 0L, true))))
  }

  /** Brute-force reference: count a<b<c triples whose three edges exist. */
  private def refTriangles(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val es = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val ns = (nodes ++ es.toSeq.flatMap(e => Seq(e._1, e._2))).distinct
    val deg = ns.map(v => v -> es.count(e => e._1 == v || e._2 == v).toLong).toMap
    val sorted = ns.sorted
    val tris = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
      if es((sorted(i), sorted(j)))
      k <- (j + 1) until sorted.size
      if es((sorted(i), sorted(k))) && es((sorted(j), sorted(k)))
    } yield (sorted(i), sorted(j), sorted(k))
    ns.map { v =>
      val t = tris.count(x => x._1 == v || x._2 == v || x._3 == v).toLong
      val d = deg(v)
      val c = if (d >= 2) (2000L * t) / (d * (d - 1)) else 0L
      v -> ((d, t, c))
    }.toMap
  }

  private def triangles(nodes: Seq[Long], edges: Seq[(Long, Long)],
      parts: Int = 4): Map[Long, (Long, Long, Long)] =
    Graph.triangleCounts(nodes.toDF("id"), edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("triangleCounts equals brute force on random graphs, any partitioning") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 4) {
      val n = 40
      val edges = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val nodes = (0L until n.toLong)
      val want = refTriangles(nodes, edges)
      assert(triangles(nodes, edges, parts = 3) == want, s"trial=$trial")
      assert(triangles(nodes, edges, parts = 13) == want, s"trial=$trial parts=13")
    }
  }

  test("triangleCounts: clique closes at 1000, hub star at 0, direction-blind") {
    // K5: every node has deg 4, T = C(4,2) = 6 closed wedges -> exactly 1000
    val k5 = for (a <- 0L until 5L; b <- 0L until 5L if a < b) yield (a, b)
    val got = triangles(0L until 5L, k5)
    assert(got.values.forall(_ == ((4L, 6L, 1000L))))
    // star hub: no closure anywhere; hub degree 6, leaves degree 1
    val star = (1L to 6L).map(i => (0L, i))
    val s = triangles(0L to 6L, star)
    assert(s(0L) == ((6L, 0L, 0L)) && s(1L) == ((1L, 0L, 0L)))
    // duplicate + reversed edges collapse to the same undirected set
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (1L, 2L))
    val t = triangles(Seq(1L, 2L, 3L), tri)
    assert(t.values.forall(_ == ((2L, 1L, 1000L))))
    // isolated node from `nodes` appears with zeros; empty edges fine
    assert(triangles(Seq(9L), Seq.empty) == Map(9L -> ((0L, 0L, 0L))))
  }

  test("kCore 3-core spans two bridged cliques and is partition-invariant") {
    // two K4 cliques joined by one bridge: every node keeps degree >= 3,
    // so the whole graph IS its own 3-core (the bridge does not peel)
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = k4a.map { case (a, b) => (a + 10L, b + 10L) }
    val edges = k4a ++ k4b ++ Seq((4L, 11L))
    val a = kcore((1L to 4L) ++ (11L to 14L), edges, k = 3, parts = 3)
    val b = kcore((1L to 4L) ++ (11L to 14L), edges, k = 3, parts = 11)
    assert(a == b)
    assert(a.values.forall { case (in, _, conv) => in && conv })
    assert(a(4L)._2 == 4L && a(1L)._2 == 3L) // bridge endpoint keeps its extra edge
  }

  /** Driver-side link-prediction reference: brute-force neighbor-set
    * intersection on the hub-filtered subgraph, identical integer math. */
  private def refLinkPred(edges: Seq[(Long, Long)], maxDeg: Int,
      minCommon: Int): Set[(Long, Long, Long, Long)] = {
    val can = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val deg = can.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    val kept = deg.filter(_._2 <= maxDeg).keySet
    val sub = can.filter(e => kept(e._1) && kept(e._2))
    val adj = (sub ++ sub.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && !adj(a).contains(b)
      cn = (adj(a) & adj(b)).size if cn >= minCommon
    } yield (a, b, cn.toLong,
      1000L * cn / (adj(a).size + adj(b).size - cn))).toSet
  }

  private def linkPred(edges: Seq[(Long, Long)], maxDeg: Int, minCommon: Int,
      parts: Int): Set[(Long, Long, Long, Long)] =
    Graph.linkPrediction(edges.toDF("src", "dst").repartition(parts),
        maxDeg, minCommon)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("linkPrediction matches brute force on a hand graph") {
    // path 1-2-3 plus 3-4: open wedges (1,3)? no — adjacent; (1,3) IS an
    // edge here? build: square with one diagonal missing
    // edges: 1-2, 2-3, 3-4, 4-1 → open pairs (1,3) and (2,4), cn=2 each,
    // jaccard = 2/(2+2-2) = 1000
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(linkPred(sq, 64, 2, 3) ==
      Set((1L, 3L, 2L, 1000L), (2L, 4L, 2L, 1000L)))
    assert(linkPred(sq, 64, 2, 3) == refLinkPred(sq, 64, 2))
    // duplicate + reversed edges collapse to the same undirected set
    assert(linkPred(sq ++ sq.map(_.swap), 64, 2, 2) == refLinkPred(sq, 64, 2))
  }

  test("hub filter computes on the induced subgraph, not the full graph") {
    // star hub 0 with leaves 1..5 plus path 1-2-3: with maxDeg=3 the hub
    // (degree 5) is dropped; candidates and degrees come from the path only
    val edges = (1L to 5L).map(i => (0L, i)) ++ Seq((1L, 2L), (2L, 3L))
    val got = linkPred(edges, 3, 1, 3)
    assert(got == refLinkPred(edges, 3, 1))
    // the path's single open wedge survives with SUBGRAPH degrees 1 and 1
    // (node 1's hub edge is gone): jaccard = 1000·1/(1+1−1) = 1000 — the
    // full-graph degrees (2, 2) would have said 333
    assert(got == Set((1L, 3L, 1L, 1000L)))
    // without the cap the hub makes every leaf pair a candidate
    assert(linkPred(edges, 64, 1, 3) == refLinkPred(edges, 64, 1))
    // C(5,2) leaf pairs minus the two that are real path edges (1-2, 2-3)
    assert(linkPred(edges, 64, 1, 3).size == 8)
  }

  test("linkPrediction matches brute force on random graphs, any partitioning") {
    for (seed <- Seq(3, 4)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 55).map(_ =>
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter(e => e._1 != e._2).distinct
      val want = refLinkPred(edges, 6, 1)
      assert(want.nonEmpty, s"seed=$seed degenerate")
      assert(linkPred(edges, 6, 1, 2) == want, s"seed=$seed")
      assert(linkPred(edges, 6, 1, 7) == want, s"seed=$seed parts=7")
    }
  }
}

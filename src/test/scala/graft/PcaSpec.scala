package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jacobi recovers known eigenpairs of a hand matrix") {
    // [[2,1],[1,2]] -> eigenvalues 3 and 1, eigenvectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    val k3 = vals.indexWhere(v => math.abs(v - 3.0) < 1e-12)
    assert(math.abs(math.abs(vecs(0)(k3)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(vecs(0)(k3) - vecs(1)(k3)) < 1e-12) // same sign
  }

  private def mkEmb(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")

  test("fit finds the dominant axis of stretched 2D data") {
    val rnd = new scala.util.Random(3)
    // x along (1,1) with spread 10, noise across with spread 0.1
    val vs = (1 to 400).map { _ =>
      val t = rnd.nextGaussian() * 10.0
      val e = rnd.nextGaussian() * 0.1
      Array((t + e).toFloat, (t - e).toFloat)
    }
    val m = Pca.fit(mkEmb(vs), "embedding", dim = 2, r = 2)
    assert(m.eigvals(0) > 100 * m.eigvals(1)) // dominant direction
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(0)) - math.abs(c0(1))) < 0.02, c0.mkString(","))
    assert(math.abs(m.eigSum - m.traceC) < 1e-6 * math.max(1.0, m.traceC))
  }

  test("moments are exactly partition-invariant") {
    val rnd = new scala.util.Random(9)
    val vs = (1 to 200).map(_ => Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val a = Pca.fit(mkEmb(vs).repartition(1), "embedding", 8, 3)
    val b = Pca.fit(mkEmb(vs).repartition(7), "embedding", 8, 3)
    assert(a.n == b.n)
    assert(a.meanNum.sameElements(b.meanNum))
    assert(a.gramDiag.sameElements(b.gramDiag))
    assert(a.eigvals.sameElements(b.eigvals)) // same exact moments -> same eig
  }

  test("uncentered fit with r = d is a rotation: dot products preserved") {
    val rnd = new scala.util.Random(13)
    val vs = (1 to 60).map(_ => Array.fill(5)(rnd.nextFloat() * 2 - 1))
    val df = mkEmb(vs)
    val m = Pca.fit(df, "embedding", 5, 5, centered = false)
    import org.apache.spark.sql.functions.col
    val proj = Pca.project(df, "embedding", m, "p")
      .select(col("vec_id"), col("p")).as[(Long, Array[Float])]
      .collect().toMap
    // quantized originals (the space the model lives in)
    val q = vs.zipWithIndex.map { case (v, i) =>
      i.toLong -> v.map(x => math.floor(x.toDouble * 1024.0))
    }.toMap
    for (a <- 0L to 5L; b <- a to 5L) {
      val want = q(a).zip(q(b)).map { case (x, y) => x * y }.sum
      val got = proj(a).zip(proj(b)).map { case (x, y) => x.toDouble * y }.sum
      assert(math.abs(want - got) < 1e-3 * math.max(1.0, math.abs(want)),
        s"pair ($a,$b): $want vs $got")
    }
  }

  test("projected coordinate variance matches the eigenvalues") {
    val rnd = new scala.util.Random(5)
    val vs = (1 to 500).map(_ => Array.fill(6)(rnd.nextGaussian().toFloat))
    val df = mkEmb(vs)
    val m = Pca.fit(df, "embedding", 6, 6)
    val proj = Pca.project(df, "embedding", m, "p")
      .select(col("p")).as[Array[Float]].collect()
    for (k <- 0 until 6) {
      val xs = proj.map(_(k).toDouble)
      val mean = xs.sum / xs.length
      val varK = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(math.abs(varK - m.eigvals(k)) < 0.05 * math.max(1.0, m.eigvals(k)),
        s"k=$k var=$varK eig=${m.eigvals(k)}")
    }
  }
}

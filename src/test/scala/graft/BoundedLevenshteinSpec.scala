package graft

import graft.plans.BoundedLevenshtein
import org.scalatest.funsuite.AnyFunSuite

class BoundedLevenshteinSpec extends AnyFunSuite {

  /** Reference full DP for the property check. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  test("banded distance equals full DP when within bound, bound+1 otherwise") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    for (_ <- 1 to 2000) {
      val a = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(5))).mkString
      val b = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(5))).mkString
      val bound = rnd.nextInt(4)
      val full = lev(a, b)
      val got = BoundedLevenshtein.distance(a, b, bound)
      if (full <= bound) assert(got == full, s"a=$a b=$b bound=$bound")
      else assert(got == bound + 1, s"a=$a b=$b bound=$bound full=$full got=$got")
    }
  }

  test("edge cases: empty strings, identical strings, bound 0") {
    assert(BoundedLevenshtein.distance("", "", 2) == 0)
    assert(BoundedLevenshtein.distance("", "abc", 2) == 3) // > bound → bound+1
    assert(BoundedLevenshtein.distance("abc", "abc", 0) == 0)
    assert(BoundedLevenshtein.distance("abc", "abd", 0) == 1) // bound+1
    assert(BoundedLevenshtein.distance("kitten", "sitting", 3) == 3)
  }

  test("expression is codegen-compatible in a real plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    BoundedLevenshtein.register(spark)
    val out = Seq(("kitten", "sitting"), ("abc", "xyz"), ("same", "same"))
      .toDF("a", "b")
      .selectExpr("bounded_levenshtein(a, b, 3) AS d")
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(3, 3, 0)) // "abc"→"xyz" dist 3 ≤ bound? full=3, bound=3 → 3
  }
}

package graft

import graft.plans.BoundedLevenshtein
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure-JVM kernels (SURVEY.md §5 plan:
  * property-based tests for the normalizers/similarity kernels). */
object PropertiesSpec extends Properties("graft") {

  private val smallString: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("abcdef".toSeq)).map(_.mkString))

  private def fullLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  property("boundedLevenshtein = min(fullLev, bound+1)") =
    Prop.forAll(smallString, smallString, Gen.chooseNum(0, 6)) { (a, b, k) =>
      BoundedLevenshtein.distance(a, b, k) == math.min(fullLev(a, b), k + 1)
    }

  property("boundedLevenshtein is symmetric") =
    Prop.forAll(smallString, smallString, Gen.chooseNum(0, 6)) { (a, b, k) =>
      BoundedLevenshtein.distance(a, b, k) == BoundedLevenshtein.distance(b, a, k)
    }

  property("boundedLevenshtein triangle-ish: identical strings are distance 0") =
    Prop.forAll(smallString, Gen.chooseNum(0, 6)) { (a, k) =>
      BoundedLevenshtein.distance(a, a, k) == 0
    }

  property("flag money arithmetic: decimal cents are exact for 2-dp doubles") =
    Prop.forAll(Gen.listOfN(50, Gen.chooseNum(1, 49999))) { centsList =>
      val doubles = centsList.map(c => c / 100.0)
      val summed = doubles.map(BigDecimal.valueOf)
        .foldLeft(BigDecimal(0))(_ + _) * 100
      summed.toLongExact == centsList.map(_.toLong).sum
    }
}

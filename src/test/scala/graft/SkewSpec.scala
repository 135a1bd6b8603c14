package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain equi-join on skewed data") {
    // 90% of rows share one hot key — the salting target.
    val big = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong else 1L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (999L, "unmatched"))
      .toDF("k2", "tag")
    val plain = big.join(small, col("k") === col("k2"))
      .select("k", "payload", "tag")
    val salted = Skew.saltedJoin(big, small, "k", "k2", 8)
      .select("k", "payload", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}

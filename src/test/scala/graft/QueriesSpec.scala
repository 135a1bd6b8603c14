package graft

import graft.queries.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide smoke: every declared query must execute on sf0.001 and the
  * core ones must return rows. (Value-level correctness is the driver's
  * DuckDB-oracle gate — `scripts/check_oracle.py` locally.) */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // Queries whose correct result can legitimately be empty at tiny scale.
  private val mayBeEmpty = Set("a9_dup_groups", "j9_amount_date_link",
    "d4_ngram_jaccard", "k3_embedding_neardup", "a12_count_threshold")

  test("query names are unique and every query has oracle SQL or a reason") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length)
    assert(Registry.all.count(_.oracle.isDefined) == Registry.all.length,
      "every round-1 query is SQL-expressible; drop this assert when a non-SQL op lands")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001" +
        (if (mayBeEmpty(q.name)) "" else " and returns rows")) {
      val n = q.run(spark, sf).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}

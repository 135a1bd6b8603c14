package graft

import graft.ops.QuantileSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the deterministic quantile-histogram sketch: bucket order =
  * value order, bounds contain the value, merge is exact, and the rank-pick
  * brackets the true percentile_disc value. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val values: Seq[Double] =
    Seq(0.0, 0.0001, 0.0009, 0.001, 0.09, 0.1, 0.99, 1.0, 1.05, 9.99,
      10.0, 42.5, 99.99, 100.0, 123.45, 999.0, 1000.0, 54321.9876,
      99999.99, 100000.0) ++ (1 to 400).map(i => i * 7.3 % 5000)

  test("bucketId is monotone in the value and bounds contain it") {
    val df = values.toDF("v")
      .select(col("v"), QuantileSketch.qunits(col("v")).as("q"))
      .select(col("v"), col("q"), QuantileSketch.bucketId(col("q")).as("b"))
      .select(col("v"), col("q"), col("b"),
        QuantileSketch.bucketLow(col("b")).as("lo"),
        QuantileSketch.bucketHigh(col("b")).as("hi"))
      .orderBy(col("q"))
    val rows = df.collect()
    rows.foreach { r =>
      val (q, lo, hi) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(lo <= q && q < hi, s"q=$q outside [$lo,$hi) bucket=${r.getInt(2)}")
      // relative width bound: one step of the 2-digit mantissa (<= 10% for
      // q >= 10; absolute 1 qunit below)
      if (q >= 10) assert((hi - lo).toDouble / lo <= 0.1 + 1e-12)
      else assert(hi - lo == 1)
    }
    val bs = rows.map(_.getInt(2))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b }, "bucket order != value order")
  }

  test("histogram merge of arbitrary splits equals the one-pass histogram") {
    val df = values.zipWithIndex.map { case (v, i) => (v, i % 7) }.toDF("v", "part")
    val direct = QuantileSketch.histogram(df, Seq.empty, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = QuantileSketch.histogram(df, Seq("part"), "v")
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == direct)
  }

  test("rank-pick bucket brackets the exact percentile_disc value") {
    val df = values.toDF("v").withColumn("grp", lit("g"))
    val hist = QuantileSketch.histogram(df, Seq("grp"), "v")
    val qs = QuantileSketch.quantiles(hist, Seq("grp"),
      Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))).collect().head
    val exact = df.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)"),
      expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY v)")).collect().head
    for ((nm, i) <- Seq("p50" -> 0, "p90" -> 1, "p99" -> 2)) {
      val lo = qs.getAs[Double](s"${nm}_low")
      val hi = qs.getAs[Double](s"${nm}_high")
      val e = exact.getDouble(i)
      // containment is stated on the quantized axis (DECIMAL(18,4) rounds)
      val eq = math.rint(e * 10000).toLong
      assert(math.rint(lo * 10000).toLong <= eq && eq < math.rint(hi * 10000).toLong,
        s"$nm: exact=$e outside [$lo,$hi)")
    }
    assert(qs.getAs[Long]("n") == values.size)
  }

  test("decade and mantissa boundaries bucket exactly (and the 1e14 domain holds)") {
    // values AT bucket boundaries: powers of 10, two-digit-head steps, and
    // the DECIMAL(18,4) rounding edge x.99995 (rounds up into the next head)
    val edges = Seq(0.0, 0.0001, 0.0009999, 0.001, 9.9999, 9.99995, 10.0,
      99.99995, 100.0, 0.99995, 1.0, 12.0, 12.99995, 13.0, 9999999999.9999)
    val got = edges.toDF("v")
      .select(col("v"), QuantileSketch.qunits(col("v")).as("q"))
      .select(col("v"), col("q"), QuantileSketch.bucketId(col("q")).as("b"))
      .select(col("q"), col("b"),
        QuantileSketch.bucketLow(col("b")).as("lo"),
        QuantileSketch.bucketHigh(col("b")).as("hi"))
      .collect()
    got.foreach { r =>
      val (q, lo, hi) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(lo <= q && q < hi, s"q=$q outside [$lo,$hi)")
    }
    // 9.99995 rounds to qunits 100000 → the 10.0 bucket, same as 10.0
    val byV = edges.zip(got).toMap
    assert(byV(9.99995).getInt(1) == byV(10.0).getInt(1))
    // histogram drops values outside [0, 1e14) on BOTH nullable paths
    val dom = QuantileSketch.histogram(
      Seq(Some(5.0), Some(-1.0), None, Some(1e14), Some(2e15)).toDF("v"),
      Seq.empty, "v")
    assert(dom.agg(sum(col("cnt"))).head.getLong(0) == 1L)
  }

  test("state stays bounded: 5k distinct values over 8 decades < 1.3k buckets") {
    val wide = (1 to 5000).map(i => math.pow(10, (i % 80) / 10.0) * (1 + i % 97 / 100.0))
    val hist = QuantileSketch.histogram(wide.toDF("v"), Seq.empty, "v")
    assert(hist.count() <= 1300)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form ordinary least squares — the distributed "linear probe"
  * training pattern: ONE corpus pass of exact integer moment sums (the only
  * distributed stage, a map-side-combinable aggregate), then the 3×3 normal
  * equations solved in closed form by Cramer's rule. No SGD, no iterations,
  * no shuffle beyond the single aggregation; model state is 9 numbers.
  *
  * Cross-engine determinism: features and target are INTEGERS, so every
  * moment is an exact BIGINT sum (order-independent); the determinant and
  * coefficient arithmetic then runs in DOUBLE through ONE fixed expression
  * tree mirrored verbatim in the SQL oracle (the a4c HLL-estimator
  * precedent), so the IEEE results are engine-identical and hash-match.
  *
  * This is the same "exact distributed moments + tiny driver-free closed
  * form" discipline as Pca.fit (k14) — but here even the solve stays in the
  * plan: Cramer on a 3×3 needs no factorization.
  */
object Regression {

  /** Exact second-moment sums for y ~ 1 + x1 + x2 over integer columns:
    * one row (n, sx1, sx2, sy, sx11, sx12, sx22, sx1y, sx2y, syy), every
    * entry an exact BIGINT. */
  def olsMoments(df: DataFrame, x1: Column, x2: Column, y: Column): DataFrame =
    df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .filter(col("x1").isNotNull && col("x2").isNotNull && col("y").isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("x1")).as("sx11"),
        sum(col("x1") * col("x2")).as("sx12"),
        sum(col("x2") * col("x2")).as("sx22"),
        sum(col("x1") * col("y")).as("sx1y"),
        sum(col("x2") * col("y")).as("sx2y"),
        sum(col("y") * col("y")).as("syy"))

  /** The closed-form solve + fit metrics appended to a moments row:
    * beta0/beta1/beta2 by Cramer's rule on the normal equations
    * [[n sx1 sx2][sx1 sx11 sx12][sx2 sx12 sx22]] beta = [sy sx1y sx2y],
    * sse = y'y − 2 b'X'y + b'X'Xb expanded over the stored moments, and
    * r2 = 1 − sse/sst. Pure column arithmetic — the same expression
    * strings feed [[olsSolveSql]] so both engines evaluate the identical
    * IEEE tree. */
  def olsSolve(moments: DataFrame): DataFrame = {
    val withBeta = exprs.foldLeft(moments) { case (acc, (nm, e)) =>
      acc.withColumn(nm, expr(e))
    }
    withBeta.select(col("n"), col("sx1"), col("sx2"), col("sy"),
      col("sx11"), col("sx12"), col("sx22"), col("sx1y"), col("sx2y"),
      col("syy"), col("beta0"), col("beta1"), col("beta2"), col("r2"))
  }

  /** (name, expression) pairs shared verbatim by both engines. DOUBLE casts
    * pin the whole tree to IEEE doubles from the first operation. */
  private val exprs: Seq[(String, String)] = {
    val (a, b, c) = ("CAST(n AS DOUBLE)", "CAST(sx1 AS DOUBLE)", "CAST(sx2 AS DOUBLE)")
    val (d_, e_, f_) = ("CAST(sx1 AS DOUBLE)", "CAST(sx11 AS DOUBLE)", "CAST(sx12 AS DOUBLE)")
    val (g, h, i) = ("CAST(sx2 AS DOUBLE)", "CAST(sx12 AS DOUBLE)", "CAST(sx22 AS DOUBLE)")
    val (r0, r1, r2c) = ("CAST(sy AS DOUBLE)", "CAST(sx1y AS DOUBLE)", "CAST(sx2y AS DOUBLE)")
    def det3(m: Seq[String]): String = {
      val Seq(a1, b1, c1, d1, e1, f1, g1, h1, i1) = m
      s"(($a1) * (($e1) * ($i1) - ($f1) * ($h1)) - ($b1) * (($d1) * ($i1) - ($f1) * ($g1)) + ($c1) * (($d1) * ($h1) - ($e1) * ($g1)))"
    }
    val det = det3(Seq(a, b, c, d_, e_, f_, g, h, i))
    val det0 = det3(Seq(r0, b, c, r1, e_, f_, r2c, h, i))
    val det1 = det3(Seq(a, r0, c, d_, r1, f_, g, r2c, i))
    val det2 = det3(Seq(a, b, r0, d_, e_, r1, g, h, r2c))
    Seq(
      "beta0" -> s"$det0 / $det",
      "beta1" -> s"$det1 / $det",
      "beta2" -> s"$det2 / $det",
      // SSE = syy − 2 b'X'y + b'X'Xb, SST = syy − sy²/n, R² = 1 − SSE/SST
      "r2" -> {
        val bty = s"(beta0 * $r0 + beta1 * $r1 + beta2 * $r2c)"
        val btXXb =
          s"""(beta0 * (beta0 * $a + beta1 * $b + beta2 * $c)
             | + beta1 * (beta0 * $d_ + beta1 * $e_ + beta2 * $f_)
             | + beta2 * (beta0 * $g + beta1 * $h + beta2 * $i))"""
            .stripMargin.replace("\n", " ")
        val sse = s"(CAST(syy AS DOUBLE) - 2.0 * $bty + $btXXb)"
        val sst = s"(CAST(syy AS DOUBLE) - $r0 * $r0 / $a)"
        s"1.0 - $sse / $sst"
      })
  }

  /** Full oracle SQL: `x1/x2/yExpr` are the integer feature expressions
    * mirroring the Columns given to [[olsMoments]]. */
  def olsSql(x1Expr: String, x2Expr: String, yExpr: String,
      table: String, where: String = "TRUE"): String = {
    val betaSelect = exprs.map { case (nm, e) => s"  $e AS $nm" }.mkString(",\n")
    s"""WITH feats AS (
       |  SELECT CAST(($x1Expr) AS BIGINT) AS x1,
       |         CAST(($x2Expr) AS BIGINT) AS x2,
       |         CAST(($yExpr) AS BIGINT) AS y
       |  FROM $table WHERE $where),
       |m AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(x1) AS BIGINT) AS sx1, CAST(SUM(x2) AS BIGINT) AS sx2,
       |    CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x1 * x1) AS BIGINT) AS sx11,
       |    CAST(SUM(x1 * x2) AS BIGINT) AS sx12,
       |    CAST(SUM(x2 * x2) AS BIGINT) AS sx22,
       |    CAST(SUM(x1 * y) AS BIGINT) AS sx1y,
       |    CAST(SUM(x2 * y) AS BIGINT) AS sx2y,
       |    CAST(SUM(y * y) AS BIGINT) AS syy
       |  FROM feats WHERE x1 IS NOT NULL AND x2 IS NOT NULL AND y IS NOT NULL),
       |solved AS (
       |  SELECT n, sx1, sx2, sy, sx11, sx12, sx22, sx1y, sx2y, syy,
       |$betaSelect
       |  FROM m)
       |SELECT * FROM solved""".stripMargin
  }
}

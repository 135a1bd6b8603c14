package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Custom Catalyst `Generator`: all unordered pairs (i < j) of an array
  * column's elements — the reference's `itertools.combinations` within a group
  * (`/root/reference/data_pipeline/build_customer_interactions.py:76-120`,
  * SURVEY.md §2.9 U5) as a native UDTF.
  *
  * Compared with the self-join formulation (`g4_pairwise_combos`), the
  * generator runs group-local with zero extra shuffle: collect the group to an
  * array (one aggregation), then emit its pairs inline — the right trade when
  * groups are small and bounded (here ≤7 lineitems/order), which is exactly
  * when pairwise explosion is safe at 100 TB.
  */
case class PairCombinations(child: Expression) extends UnaryExpression
    with Generator with CodegenFallback {

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elementType), StructField("b", elementType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_combinations requires an array argument, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Nil
    else {
      val arr = data.asInstanceOf[ArrayData]
      val n = arr.numElements()
      for {
        i <- 0 until n
        j <- (i + 1) until n
      } yield InternalRow(arr.get(i, elementType), arr.get(j, elementType))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombinations =
    copy(child = newChild)
}

object PairCombinations {
  /** Register `pair_combinations` in the session's function registry (usable
    * from SQL and via expr()). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pair_combinations", exprs => PairCombinations(exprs.head), "built-in")

  /** Generate (a, b) pair rows from `arrayCol`, keeping `keep` columns. */
  def pairsOf(spark: SparkSession, df: DataFrame, arrayCol: String, keep: Seq[String]): DataFrame = {
    register(spark)
    df.select((keep.map(c => expr(c)) :+ expr(s"pair_combinations($arrayCol) AS (a, b)")): _*)
  }
}

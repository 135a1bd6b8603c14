package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<float>` columns in
  * double precision, as a fixed ascending-index fold.
  *
  * The SQL spelling `aggregate(zip_with(a, b, (x, y) -> ...), 0D, ...)`
  * allocates an intermediate array and interprets the lambda per element —
  * per-pair overhead that dominates a blocked all-pairs similarity scan
  * (SURVEY.md §7.5; the embedding near-dup hot path). This expression is a
  * primitive float loop over the unsafe array data, fused into
  * whole-stage codegen via `doGenCode`, and computes bit-identical results
  * to the SQL fold (same order, same widening), so it can replace it
  * anywhere, prefilter or not.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    FloatDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FloatDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $cls.dot($l, $r);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : FloatDot = copy(left = newLeft, right = newRight)
}

object FloatDot {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Register `float_dot(a, b)` for SQL/expr use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDot(exprs(0), exprs(1)), "built-in")
}

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
  * primitive float loop over the unsafe array data, fused into whole-stage
  * codegen via `doGenCode`, and matches the SQL fold exactly — same order,
  * same widening, AND the same null semantics: `zip_with` pads the shorter
  * array with nulls and the `+` fold swallows the whole sum to NULL, so a
  * length mismatch returns null here too, as does any null element. It can
  * therefore replace the SQL spelling anywhere, prefilter or not.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    FloatDot.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FloatDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (l, r) => s"""
       |java.lang.Double $boxed = (java.lang.Double) $cls.dot($l, $r);
       |if ($boxed == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $boxed.doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : FloatDot = copy(left = newLeft, right = newRight)
}

object FloatDot {

  /** Null (not a number) on length mismatch or any null element — the SQL
    * `aggregate(zip_with(...))` fold's semantics. The boxed return only
    * materializes on the null paths' caller side; the loop itself is a
    * primitive float accumulation over unsafe array data. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Register `float_dot(a, b)` for SQL/expr use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDot(exprs(0), exprs(1)), "built-in")
}

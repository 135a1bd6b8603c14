package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Levenshtein distance with an early-exit bound.
  *
  * The fuzzy-join hot path (SURVEY.md §2.3 J7,
  * `/root/reference/data_pipeline/customer_matching.py:104-120`) only cares
  * whether two strings are within distance k; the classic DP can abandon a row
  * pair as soon as every cell in a band exceeds k, turning O(n·m) into
  * O(k·min(n,m)) — the banded algorithm from Ukkonen '85. Returns min(dist,
  * bound+1), so `bounded_levenshtein(a, b, k) <= k` is exactly
  * `levenshtein(a, b) <= k` while skipping most of the work on mismatches —
  * which is nearly all pairs in a blocked similarity join at scale.
  *
  * Implements `doGenCode` so the whole-stage-codegen join stays fused: the
  * static helper is called directly from the generated Java.
  */
case class BoundedLevenshtein(left: Expression, right: Expression, bound: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    BoundedLevenshtein.distance(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString, bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BoundedLevenshtein.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $cls.distance($l.toString(), $r.toString(), $bound);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression)
      : BoundedLevenshtein = copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {

  /** Banded Levenshtein: exact when <= bound, else bound+1. */
  def distance(a: String, b: String, bound: Int): Int = {
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (m - n > bound) return bound + 1
    val inf = bound + 1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    java.util.Arrays.fill(prev, inf)
    var i = 0
    while (i <= math.min(n, bound)) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= m) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, j - bound)
      val hi = math.min(n, j + bound)
      if (lo == 1) cur(0) = if (j <= bound) j else inf
      var best = if (lo == 1) cur(0) else inf
      var k = lo
      while (k <= hi) {
        val cost = if (s.charAt(k - 1) == t.charAt(j - 1)) 0 else 1
        var v = prev(k - 1) + cost
        if (prev(k) + 1 < v) v = prev(k) + 1
        if (cur(k - 1) + 1 < v) v = cur(k - 1) + 1
        if (v > inf) v = inf
        cur(k) = v
        if (v < best) best = v
        k += 1
      }
      if (best >= inf) return inf // early exit: whole band exceeded the bound
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    math.min(prev(n), inf)
  }

  /** Register `bounded_levenshtein(a, b, k)` for SQL/expr use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_levenshtein",
      exprs => BoundedLevenshtein(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Int]),
      "built-in")
}

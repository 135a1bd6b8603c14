package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` (Flajolet et al. '07), built for CROSS-ENGINE
  * verifiability rather than raw speed: the hash is md5 of the value's
  * string form (the repo-wide portable-hash idiom — bit-identical in any
  * engine with an md5), so a SQL oracle can replay the EXACT register state
  * with `md5` + string ops and the sketch output hash-matches, not just
  * tolerance-matches. Unlike `approx_count_distinct` (HLL++ with an opaque
  * xxhash64 state), every intermediate here is independently recomputable.
  *
  * Geometry: p = 8 → m = 256 registers, one byte each. For a value v:
  * bucket = first 8 bits of md5(v); rho = 1 + number of leading zero bits
  * in the NEXT 64 bits (65 if that window is all zeros); register =
  * max(rho) over the group. The state is a 256-byte array — registers are
  * per-bucket maxima, so update/merge are commutative, associative and
  * idempotent: the result is partitioning- and order-INDEPENDENT (the
  * property that makes the exact oracle possible; a t-digest or KLL state
  * would not have it).
  *
  * `eval` returns struct(s_hi BIGINT, s_lo BIGINT, zeros INT) where
  * s_hi·2^36 + s_lo = Σ_j 2^(65 − M_j) — the harmonic-mean denominator
  * lifted to an EXACT integer (max 256·2^65 = 2^73, so s_hi ≤ 2^37 and
  * s_lo < 2^36, both int64-safe); zeros is the empty-register count for the
  * linear-counting small-range correction. The hi/lo split (not a single
  * DECIMAL(38,0)) is deliberate: values ≈ 9e21 survive Spark's parquet as
  * exact Decimal but degrade to float64 in DuckDB's pandas conversion, so a
  * canonical-string hash gate sees `6.48e+21` vs the exact digits and
  * fails — every hash-gated output column must stay inside int64.
  * The floating-point estimate (alpha·m²·2^65 / s, or m·ln(m/zeros) below
  * 2.5m) is left to the caller: it is the only non-exact step, so it stays
  * OUT of the hash-gated sketch state.
  *
  * Scale shape: a grouped aggregation with a fixed 256-byte state per
  * group — map-side partial merge like any native agg, shuffle carries one
  * sketch per (partition, group). At 100 TB this is the point: exact
  * distinct over a high-cardinality key shuffles the key universe; this
  * shuffles 256 bytes per group. */
/** Shared shell of the three HLL aggregates: 256-byte register buffer,
  * identity serialization, element-wise-max partial merge, and the
  * STRING/BINARY input contract — the genuine differences (what `update`
  * folds and what `eval` returns) stay in the concrete classes. */
abstract class HllAggBase
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {
  import HllSketch._
  /** Required input type of `child` (callers cast; AbstractDataType is
    * private[sql] in Spark 4, so the check lives here). */
  protected def expectedInput: DataType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == expectedInput)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a ${expectedInput.sql} child, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    maxMerge(b1, b2)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
}

case class HllSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase {
  import HllSketch._
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = HllSketch.outputType
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    updateRegisters(buf, child.eval(input))
  override def eval(buf: Array[Byte]): Any = evalStruct(buf)
  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllSketch =
    copy(child = c)
  override def prettyName: String = "hll_sketch"
}

/** The PERSISTENCE half of the sketch lifecycle: same update math as
  * [[HllSketch]], but `eval` returns the raw 256-byte register array
  * (BinaryType) so partial sketches can be STORED (a per-day mart column)
  * and unioned later with [[HllMerge]] — the mergeable-sketch warehouse
  * pattern: at 100 TB you never re-scan history to extend a distinct count,
  * you max-merge KB-sized states. */
case class HllState(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase {
  import HllSketch._
  override protected def expectedInput: DataType = StringType
  override def dataType: DataType = BinaryType
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    updateRegisters(buf, child.eval(input))
  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def withNewMutableAggBufferOffset(o: Int): HllState =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllState =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllState =
    copy(child = c)
  override def prettyName: String = "hll_state"
}

/** The UNION half: aggregates stored [[HllState]] register arrays by
  * element-wise max (sketch union is exact — no error compounds on merge)
  * and evals to the same struct(s, zeros) as [[HllSketch]], so a merge of
  * per-day states is BIT-IDENTICAL to one sketch over the union of the
  * underlying values — the property a4d's oracle asserts. */
case class HllMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase {
  import HllSketch._
  override protected def expectedInput: DataType = BinaryType
  override def dataType: DataType = HllSketch.outputType
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val st = v.asInstanceOf[Array[Byte]]
      require(st.length == M, s"hll_state must be $M bytes, got ${st.length}")
      maxMerge(buf, st)
    }
    buf
  }
  override def eval(buf: Array[Byte]): Any = evalStruct(buf)
  override def withNewMutableAggBufferOffset(o: Int): HllMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllMerge =
    copy(child = c)
  override def prettyName: String = "hll_merge"
}

object HllSketch {
  /** Register count (p = 8). */
  val M = 256

  /** The int64-safe sketch readout: s_hi·2^36 + s_lo = Σ 2^(65−M_j). */
  val outputType: StructType = StructType(Seq(
    StructField("s_hi", LongType, nullable = false),
    StructField("s_lo", LongType, nullable = false),
    StructField("zeros", IntegerType, nullable = false)))

  /** Fold one raw value (UTF8String or null) into the register array. */
  private[plans] def updateRegisters(buf: Array[Byte], v: Any): Array[Byte] = {
    if (v != null) {
      val d = digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .getBytes)
      val bucket = d(0) & 0xff
      val rho = rhoOf(d)
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  private[plans] def maxMerge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  private[plans] def evalStruct(buf: Array[Byte]): InternalRow = {
    var s = java.math.BigInteger.ZERO
    var zeros = 0
    var i = 0
    while (i < M) {
      val m = buf(i) & 0xff
      s = s.add(java.math.BigInteger.ONE.shiftLeft(65 - m))
      if (m == 0) zeros += 1
      i += 1
    }
    // Split at 2^36: max s = 2^73 so hi ≤ 2^37 — both halves int64-safe
    // (a DECIMAL(38,0) here degrades to float64 in DuckDB's pandas path and
    // breaks the cross-engine canonical-string hash).
    val hi = s.shiftRight(36).longValueExact()
    val lo = s.and(java.math.BigInteger.valueOf((1L << 36) - 1)).longValue()
    InternalRow(hi, lo, zeros)
  }

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val m = md.get(); m.reset(); m.digest(bytes)
  }

  /** 1 + leading zeros of the 64-bit window in digest bytes 1..8 (hex chars
    * 3..18 — the window a SQL oracle reads off the md5 hex string); 65 when
    * the window is all zeros. */
  private def rhoOf(d: Array[Byte]): Int = {
    var w = 0L
    var i = 1
    while (i <= 8) { w = (w << 8) | (d(i) & 0xffL); i += 1 }
    if (w == 0L) 65 else java.lang.Long.numberOfLeadingZeros(w) + 1
  }

  /** Register `hll_sketch(stringExpr)` for SQL/expr use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_sketch",
      exprs => HllSketch(exprs.head).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_state",
      exprs => HllState(exprs.head).toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_merge",
      exprs => HllMerge(exprs.head).toAggregateExpression(),
      "built-in")
  }
}

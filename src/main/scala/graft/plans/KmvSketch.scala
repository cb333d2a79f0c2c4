package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Deterministic KMV (k-minimum-values) distinct-count sketch — a custom
  * Catalyst TypedImperativeAggregate (the "novel sketch" extension class
  * from the builder brief; same machinery Spark's own HLL uses).
  *
  * The aggregate keeps the k smallest values of a universal hash
  * h(x) = ((x mod p)·a + b) mod p  over the prime p = 2³¹−1, and estimates
  * |distinct| = (k−1) / (h₍ₖ₎ / p). Unlike HyperLogLog the whole pipeline
  * is exactly reproducible in ANSI SQL (ORDER BY hash LIMIT k), so the
  * DuckDB oracle can verify the ESTIMATE bit-for-bit — a sketch you can
  * differential-test.
  *
  * Scale properties: buffer is O(k) longs; partial aggregation works
  * map-side (merge = union + trim); inputs stream through without
  * materializing the distinct set.
  */
case class KmvSketch(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] {

  import KmvSketch._

  // integral or string only: Number.longValue() on fractional input would
  // silently collapse distinct values (1.2 and 1.4 both hash as 1); other
  // types would ClassCastException at runtime — fail at ANALYSIS instead.
  // Strings pre-hash through md5 ([[KmvSketch.md5Prefix60]]), the same
  // engine-portable trick the split/fingerprint family uses, so the
  // DuckDB oracle stays bit-exact for URL/doc-id distinct counts.
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      // analysis-time, not arr(-1) inside an executor task
      TypeCheckResult.TypeCheckFailure(s"graft_kmv k must be >= 1 (got $k)")
    else child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv requires an integral or string column, got ${t.simpleString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(hashOf(v, child.dataType))
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.values.foreach(buf.add)
    buf
  }

  override def eval(buf: Buffer): Any = buf.estimate

  override def serialize(buf: Buffer): Array[Byte] = {
    val vs = buf.values
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buffer(k)
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketch =
    copy(child = c.head)
}

/** The PARTIAL form of [[KmvSketch]]: same buffer and hash, but evaluates
  * to the sorted k-min hash ARRAY — the shape a materialized view stores
  * per group ([[graft.ops.MatViews]] `kmvs` partials) and [[KmvMerge]]
  * re-aggregates. Union of k-min sets trimmed to k IS the k-min set of
  * the union, so navigating a query's [[KmvSketch]] onto merged partials
  * returns the bit-identical estimate. */
case class KmvPartial(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] {
  import KmvSketch._
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"graft_kmv_partial k must be >= 1 (got $k)")
    else child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_partial requires an integral or string column, got ${t.simpleString}")
    }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def createAggregationBuffer(): Buffer = new Buffer(k)
  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(hashOf(v, child.dataType))
    buf
  }
  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.values.foreach(buf.add); buf
  }
  override def eval(buf: Buffer): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.values.toArray)
  override def serialize(buf: Buffer): Array[Byte] = KmvSketch.ser(buf)
  override def deserialize(bytes: Array[Byte]): Buffer = KmvSketch.deser(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): KmvPartial =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvPartial =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvPartial =
    copy(child = c.head)
}

/** Re-aggregate stored [[KmvPartial]] hash arrays back into the
  * distinct-count ESTIMATE — what [[graft.plans.MatViewRewrite]] swaps a
  * query's [[KmvSketch]] for when the view maintains the sketch. */
case class KmvMerge(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] {
  import KmvSketch._
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"graft_kmv_merge k must be >= 1 (got $k)")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_merge requires array<bigint> (a graft_kmv_partial column), got ${t.simpleString}")
    }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def createAggregationBuffer(): Buffer = new Buffer(k)
  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) { buf.add(arr.getLong(i)); i += 1 }
    }
    buf
  }
  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.values.foreach(buf.add); buf
  }
  override def eval(buf: Buffer): Any = buf.estimate
  override def serialize(buf: Buffer): Array[Byte] = KmvSketch.ser(buf)
  override def deserialize(bytes: Array[Byte]): Buffer = KmvSketch.deser(bytes, k)
  override def withNewMutableAggBufferOffset(o: Int): KmvMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMerge =
    copy(child = c.head)
}

object KmvSketch {
  /** p = 2³¹−1 (prime); a, b fixed — the same constants the oracle uses. */
  val P = 2147483647L
  val A = 1103515245L % P
  val B = 12345L

  def hash(x: Long): Long = (((x % P + P) % P) * A + B) % P

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Engine-portable string pre-hash: the value of the first 15 hex chars
    * of md5 (= the digest's top 60 bits) — exactly Spark's
    * `conv(substring(md5(s), 1, 15), 16, 10)` and DuckDB's
    * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`, the same trick
    * the split/fingerprint family uses, so string distinct counts stay
    * differential-testable bit-for-bit. */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val md = md5Local.get(); md.reset()
    java.nio.ByteBuffer.wrap(md.digest(bytes)).getLong >>> 4
  }

  /** The sketch hash of one runtime value, by input type: strings pre-hash
    * through [[md5Prefix60]]; integrals feed [[hash]] directly. Must stay
    * in lock-step with [[hashCol]]'s expression form. */
  def hashOf(v: Any, t: DataType): Long = t match {
    case StringType => hash(md5Prefix60(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))
    case _ => hash(v.asInstanceOf[Number].longValue())
  }

  /** k smallest distinct hashes. Sorted-array buffer: k is small and
    * insertion is rare once the buffer saturates (only values below the
    * current k-th minimum enter). */
  final class Buffer(k: Int) {
    private val arr = new Array[Long](k)
    private var n = 0

    def add(h: Long): Unit = {
      if (n == k && h >= arr(n - 1)) return
      var i = java.util.Arrays.binarySearch(arr, 0, n, h)
      if (i >= 0) return // already present (KMV is over DISTINCT hashes)
      i = -i - 1
      val last = math.min(n, k - 1)
      System.arraycopy(arr, i, arr, i + 1, last - i)
      arr(i) = h
      if (n < k) n += 1
    }

    def values: Seq[Long] = arr.take(n).toSeq

    def estimate: Double =
      if (n < k) n.toDouble // fewer distinct than k → exact
      else (k - 1).toDouble / (arr(k - 1).toDouble / P.toDouble)
  }

  private[plans] def ser(buf: Buffer): Array[Byte] = {
    val vs = buf.values
    val bb = ByteBuffer.allocate(4 + 8 * vs.length)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  private[plans] def deser(bytes: Array[Byte], k: Int): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buffer(k)
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  private def viaRegistry(name: String,
      mk: Seq[Expression] => Expression, c: Column): Column =
    FixedPointDot.viaRegistry(name, mk, c)

  /** Column API via the function-registry route (see FixedPointDot.dot). */
  def distinctEstimate(c: Column, k: Int = 64): Column =
    viaRegistry(s"graft_kmv_$k",
      exprs => KmvSketch(exprs.head, k).toAggregateExpression(), c)

  /** [[KmvPartial]] as a Column aggregate — the view-side partial. */
  def partialCol(c: Column, k: Int = 64): Column =
    viaRegistry(s"graft_kmv_partial_$k",
      exprs => KmvPartial(exprs.head, k).toAggregateExpression(), c)

  /** [[KmvMerge]] as a Column aggregate — re-aggregate stored partials. */
  def mergeCol(c: Column, k: Int = 64): Column =
    viaRegistry(s"graft_kmv_merge_$k",
      exprs => KmvMerge(exprs.head, k).toAggregateExpression(), c)

  /** The sketch's hash as a Column — what maintenance uses to decide
    * whether a RETRACTED value could be inside a stored sketch (its hash
    * at or below the stored k-th minimum). Matches [[hashOf]] exactly:
    * strings pre-hash through the md5-prefix long, the product fits a
    * long (both factors < 2³¹). */
  def hashCol(c: Column, dt: DataType): Column = {
    import org.apache.spark.sql.functions.{conv, lit, md5, pmod, substring}
    val pre = dt match {
      case StringType => conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      case _ => c.cast("long")
    }
    pmod(pmod(pre, lit(P)) * lit(A) + lit(B), lit(P))
  }

  /** Integral-input form, kept for callers that know their type. */
  def hashCol(c: Column): Column = hashCol(c, LongType)
}

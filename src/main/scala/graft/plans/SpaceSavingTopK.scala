package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., ICDT'05) as a
  * Catalyst TypedImperativeAggregate — the frequent-items operator a
  * training-data pipeline runs over domains/URLs/boilerplate tokens
  * where the true item cardinality dwarfs memory.
  *
  * Bounded buffer of `capacity` (item, count, err) entries; a new item
  * arriving at a full buffer evicts the minimum-count entry and inherits
  * its count as overestimation error. Guarantees (N = stream length):
  *  - estimate bounds: true ≤ count ≤ true + N/capacity;
  *  - any item with true frequency > N/capacity is IN the sketch.
  * When capacity ≥ |distinct| no eviction ever happens anywhere — every
  * count is EXACT and merge-order independent, which is the
  * configuration the DuckDB oracle verifies bit-for-bit (hh1); the
  * bounded regime's guarantees are property-tested in SpaceSavingSpec.
  *
  * Scale: O(capacity) state, map-side partial aggregation (merge =
  * entry-wise add + re-trim), inputs stream through.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buffer] {

  import SpaceSavingTopK._

  override def checkInputDataTypes(): TypeCheckResult =
    if (capacity < 1)
      // analysis-time, not an opaque executor crash: capacity 0 would make
      // the eviction branch silently grow the "bounded" buffer forever
      TypeCheckResult.TypeCheckFailure(
        s"graft_space_saving capacity must be >= 1 (got $capacity)")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_space_saving requires a string column, got ${t.simpleString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = OutType

  override def createAggregationBuffer(): Buffer = new Buffer(capacity)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString, 1L, 0L)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    other.foreach { (item, cnt, err) => buf.add(item, cnt, err) }
    buf
  }

  /** Entries sorted by (count desc, item asc) — a total order, so the
    * output array is deterministic whenever counts are. */
  override def eval(buf: Buffer): Any = {
    val rows = buf.entries
      .sortBy { case (item, cnt, _) => (-cnt, item) }
      .map { case (item, cnt, err) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(item), cnt, err))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(es.length)
    es.foreach { case (item, cnt, err) =>
      // length-prefixed raw UTF-8, NOT writeUTF: the modified-UTF-8 form
      // caps at 65535 bytes and would throw mid-shuffle on a long tracked
      // item (boilerplate paragraphs are exactly this sketch's use case)
      val ib = item.getBytes("UTF-8")
      out.writeInt(ib.length); out.write(ib)
      out.writeLong(cnt); out.writeLong(err)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buffer(capacity)
    (0 until n).foreach { _ =>
      val ib = new Array[Byte](in.readInt()); in.readFully(ib)
      buf.add(new String(ib, "UTF-8"), in.readLong(), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = c.head)
}

object SpaceSavingTopK {

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** Capped counter map. Eviction picks the minimum by (count, err, item)
    * — a total order, so the victim is deterministic for a given buffer
    * state. */
  final class Buffer(capacity: Int) {
    private val m = new java.util.HashMap[String, Array[Long]]() // (cnt, err)

    def add(item: String, cnt: Long, err: Long): Unit = {
      val cur = m.get(item)
      if (cur != null) { cur(0) += cnt; cur(1) += err }
      else if (m.size < capacity) m.put(item, Array(cnt, err))
      else {
        // evict the minimal entry; the newcomer inherits its count as error
        var minItem: String = null
        var minCnt = Long.MaxValue
        var minErr = Long.MaxValue
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue()(0); val x = e.getValue()(1)
          if (c < minCnt || (c == minCnt && (x < minErr ||
              (x == minErr && (minItem == null || e.getKey < minItem))))) {
            minItem = e.getKey; minCnt = c; minErr = x
          }
        }
        m.remove(minItem)
        m.put(item, Array(cnt + minCnt, err + minCnt))
      }
    }

    def entries: Seq[(String, Long, Long)] = {
      val b = Seq.newBuilder[(String, Long, Long)]
      m.forEach((k, v) => b += ((k, v(0), v(1))))
      b.result()
    }

    def foreach(f: (String, Long, Long) => Unit): Unit =
      m.forEach((k, v) => f(k, v(0), v(1)))
  }

  /** Column API via the function-registry route (see FixedPointDot.dot). */
  def topK(c: Column, capacity: Int): Column =
    FixedPointDot.viaRegistry(s"graft_space_saving_$capacity",
      exprs => SpaceSavingTopK(exprs.head, capacity).toAggregateExpression(), c)
}

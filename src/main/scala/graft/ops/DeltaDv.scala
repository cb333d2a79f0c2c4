package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Delta-protocol deletion-vector descriptors and their serialized bitmap
  * format, for [[DeltaInterop]]'s `add.deletionVector` payloads.
  *
  * Format (the protocol's "Deletion Vector Format", PROTOCOL.md): the
  * serialized vector is a 4-byte little-endian magic number (1681511377)
  * followed by a portable 64-bit RoaringBitmap array — an 8-byte LE
  * bitmap count, then per non-empty 32-bit bucket in ascending key order
  * a 4-byte LE key (the row index's high 32 bits) and the bucket's
  * standard portable RoaringBitmap serialization. This engine always
  * INLINES the vector in the log (`storageType = "i"`, the bytes
  * Z85-encoded in `pathOrInlineDv`, `sizeInBytes` = raw length before
  * the codec's zero padding): deleteWithVectors' documented contract is
  * takedown-scale cardinality (the bulk path is prunedDelete), so the
  * descriptor stays log-sized, no sidecar DV files enter the vacuum
  * lifecycle, and a snapshot read needs zero extra I/O.
  *
  * Z85 is ZeroMQ's base-85 (the protocol's JSON-safe choice): 4 raw
  * bytes → one big-endian uint32 → 5 alphabet chars, most significant
  * first; input is zero-padded to a multiple of 4 and the true length
  * travels in `sizeInBytes`. */
object DeltaDv {

  /** `add.deletionVector` / `remove.deletionVector` payload. */
  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      sizeInBytes: Long,
      cardinality: Long)

  private val Magic = 1681511377

  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Array[Int] = {
    val idx = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => idx(c) = i }
    idx
  }

  private[graft] def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else java.util.Arrays.copyOf(bytes, bytes.length + (4 - bytes.length % 4))
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Chars(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  private[graft] def z85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 payload length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Index(c) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >>> 24) & 0xff).toByte
      out(o + 1) = ((v >>> 16) & 0xff).toByte
      out(o + 2) = ((v >>> 8) & 0xff).toByte
      out(o + 3) = (v & 0xff).toByte
      i += 5
      o += 4
    }
    require(outLen <= out.length, s"declared size $outLen exceeds decoded ${out.length}")
    java.util.Arrays.copyOf(out, outLen)
  }

  /** Serialize row indexes to the protocol's deletion-vector bytes. */
  private[graft] def serialize(rows: Seq[Long]): Array[Byte] = {
    import org.roaringbitmap.RoaringBitmap
    val buckets = rows.distinct.groupBy(r => (r >>> 32).toInt).toSeq.sortBy(_._1)
    val bms = buckets.map { case (k, rs) =>
      val bm = new RoaringBitmap()
      rs.foreach(r => bm.add((r & 0xffffffffL).toInt)) // low 32 bits, unsigned
      bm.runOptimize()
      (k, bm)
    }
    val size = 4 + 8 + bms.map { case (_, bm) => 4 + bm.serializedSizeInBytes() }.sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic)
    buf.putLong(bms.size.toLong)
    bms.foreach { case (k, bm) =>
      buf.putInt(k)
      val at = buf.position()
      bm.serialize(buf)
      // serialize(ByteBuffer) positions past the bitmap; assert the size
      // accounting that the allocation above relied on
      require(buf.position() == at + bm.serializedSizeInBytes())
    }
    buf.array()
  }

  private[graft] def deserialize(bytes: Array[Byte]): Seq[Long] = {
    import org.roaringbitmap.RoaringBitmap
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == Magic, s"bad deletion-vector magic $magic")
    val n = buf.getLong()
    val out = Seq.newBuilder[Long]
    var i = 0L
    while (i < n) {
      val key = buf.getInt()
      val bm = new RoaringBitmap()
      bm.deserialize(buf)
      buf.position(buf.position() + bm.serializedSizeInBytes())
      bm.forEach { (v: Int) =>
        out += (key.toLong << 32) | (v & 0xffffffffL)
        ()
      }
      i += 1
    }
    out.result()
  }

  /** Inline descriptor for a file's tombstoned row indexes. */
  def inline(rows: Seq[Long]): Descriptor = {
    val raw = serialize(rows)
    Descriptor("i", z85Encode(raw), raw.length, rows.distinct.size.toLong)
  }

  /** The row indexes a descriptor tombstones. Only the inline form is
    * produced by this engine; reject others loudly instead of silently
    * under-deleting. */
  def rows(d: Descriptor): Seq[Long] = d.storageType match {
    case "i" => deserialize(z85Decode(d.pathOrInlineDv, d.sizeInBytes.toInt))
    case t => throw new IllegalArgumentException(
      s"unsupported deletionVector storageType '$t' (this engine inlines)")
  }
}

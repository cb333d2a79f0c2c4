package graft

import graft.ops.DeltaDv
import org.scalatest.funsuite.AnyFunSuite

/** The Delta deletion-vector payload codec: Z85 text round trip with
  * padding, bitmap round trip across the 32-bit bucket boundary, and the
  * inline descriptor's declared size/cardinality contract. */
class DeltaDvSpec extends AnyFunSuite {

  test("Z85 matches the published ZeroMQ test vector (alphabet pin)") {
    // spec 32/Z85's canonical example: 0x86 4F D2 6F B5 59 F7 5B encodes
    // to "HelloWorld" — a pure round-trip test cannot catch a permuted
    // alphabet, which would still round-trip internally while being
    // unreadable to every external Delta engine
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeltaDv.z85Encode(bytes) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld", 8).toSeq == bytes.toSeq)
  }

  test("Z85 round trip at every padding remainder") {
    for (len <- 0 to 9) {
      val bytes = Array.tabulate[Byte](len)(i => ((i * 37 + 11) % 251).toByte)
      val enc = DeltaDv.z85Encode(bytes)
      assert(enc.length % 5 == 0)
      assert(DeltaDv.z85Decode(enc, len).toSeq == bytes.toSeq, s"len=$len")
    }
  }

  test("bitmap round trip: dense, sparse, unsigned-low-word and >2^32 indexes") {
    val rows = Seq(0L, 1L, 2L, 3L, 1000L, 65536L, 0x7fffffffL, 0x80000000L,
      0xffffffffL, (1L << 32) + 7L, (5L << 32) + 123456L)
    val got = DeltaDv.deserialize(DeltaDv.serialize(rows))
    assert(got.sorted == rows.sorted, got.toString)
  }

  test("inline descriptor: storageType i, true size, cardinality dedupes") {
    val d = DeltaDv.inline(Seq(3L, 9L, 3L, 42L))
    assert(d.storageType == "i")
    assert(d.cardinality == 3L)
    assert(d.pathOrInlineDv.length % 5 == 0)
    assert(DeltaDv.rows(d).sorted == Seq(3L, 9L, 42L))
    intercept[IllegalArgumentException](DeltaDv.rows(d.copy(storageType = "p")))
  }

  test("empty vector round-trips") {
    val d = DeltaDv.inline(Nil)
    assert(d.cardinality == 0L)
    assert(DeltaDv.rows(d).isEmpty)
  }

  test("100k-row vector round-trips compactly (run containers engage)") {
    // a dense takedown range compresses to run containers: the inline
    // payload must stay far below the raw 8-bytes-per-index encoding,
    // or "inline in the log" would stop being log-sized
    val rows = (0L until 100000L).filter(_ % 7 != 0)
    val d = DeltaDv.inline(rows)
    assert(d.cardinality == rows.size.toLong)
    assert(d.sizeInBytes < rows.size / 4,
      s"serialized DV ${d.sizeInBytes}B for ${rows.size} rows — runOptimize not engaging")
    assert(DeltaDv.rows(d).sorted == rows)
  }

  test("descriptor round trip holds for random row-index sets (scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // indexes drawn across container regimes: small (array container),
    // dense runs (run container after runOptimize), high 32-bit buckets
    val genRows = Gen.listOfN(300, Gen.oneOf(
      Gen.choose(0L, 1000L),                       // dense low
      Gen.choose(0L, 0xffffffffL),                 // full unsigned-int range
      Gen.choose(0L, (8L << 32) - 1)))             // multi-bucket
    (0 until 16).foreach { i =>
      val rows = genRows.apply(Gen.Parameters.default, Seed(7L + i)).getOrElse(Nil)
      val d = DeltaDv.inline(rows)
      assert(d.cardinality == rows.distinct.size.toLong, s"seed ${7 + i}")
      assert(DeltaDv.rows(d).sorted == rows.distinct.sorted,
        s"seed ${7 + i}: decode(encode(rows)) != rows")
    }
  }
}

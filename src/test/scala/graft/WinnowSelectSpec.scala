package graft

import graft.plans.WinnowSelect
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests of the winnowing selection algorithm — no
  * SparkSession: the expression's static method runs on ArrayData
  * directly, so a thousand random cases cost milliseconds. */
class WinnowSelectSpec extends AnyFunSuite {

  /** Reference implementation: literally enumerate every window and take
    * its rightmost minimum. O(n·w), obviously correct. */
  private def brute(h: Array[Long], w: Int): Set[(Long, Long)] = {
    val n = h.length
    if (n == 0) return Set.empty
    val win = math.min(w, n)
    (0 to n - win).map { i =>
      val window = i until i + win
      val m = window.map(h).min
      val pos = window.filter(j => h(j) == m).max // rightmost
      ((pos + 1).toLong, h(pos))
    }.toSet
  }

  private def native(h: Array[Long], w: Int): Set[(Long, Long)] = {
    val arr = WinnowSelect.select(new GenericArrayData(h), w)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2).asInstanceOf[InternalRow]
      (r.getLong(0), r.getLong(1))
    }.toSet
  }

  private val genCase = for {
    n <- Gen.choose(0, 60)
    w <- Gen.choose(1, 8)
    // small value range forces plenty of ties (the rightmost rule's hard
    // part) alongside occasional full-range longs
    h <- Gen.listOfN(n,
      Gen.frequency(4 -> Gen.choose(0L, 4L), 1 -> Gen.choose(Long.MinValue, Long.MaxValue)))
  } yield (h.toArray, w)

  test("rolling rightmost-min selection ≡ brute-force window enumeration (1000 random cases)") {
    (0 until 1000).foreach { i =>
      val (h, w) = genCase.apply(Gen.Parameters.default, Seed(1234L + i))
        .getOrElse((Array.empty[Long], 1))
      assert(native(h, w) == brute(h, w),
        s"case $i: w=$w h=${h.mkString(",")}")
    }
  }

  test("winnowing density: ~2/(w+1) of positions selected on random data") {
    val rnd = new scala.util.Random(7)
    val h = Array.fill(100000)(rnd.nextLong())
    val w = 4
    val frac = native(h, w).size.toDouble / h.length
    assert(frac > 0.3 && frac < 0.5, s"density $frac") // 2/(w+1) = 0.4
  }
}

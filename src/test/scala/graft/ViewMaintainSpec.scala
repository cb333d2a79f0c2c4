package graft

import graft.ops.ViewMaintain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit coverage for the delta-join rule Δ(A⋈B) = ΔA⋈B₁ ∪ A₀⋈ΔB.
  *
  * Model: A(ak, av) keyed by ak (ak is also the join key), B(bk, bfk, bv)
  * keyed by bk joining on bfk = ak. Driver-side keyed states are the
  * independent oracle: the maintained joined MULTISET (fold of the signed
  * delta rows joinDelta emits) must equal a from-scratch recompute of
  * A₁⋈B₁ after EVERY interval. Deltas are the signed CDF form
  * (insert/postimage = +1, delete/preimage = −1), same as
  * [[ViewMaintain.signed]] produces.
  */
class ViewMaintainSpec extends SparkTestBase {
  import ViewMaintain.joinDelta

  private type ARel = Map[Long, Long]          // ak -> av
  private type BRel = Map[Long, (Long, Long)]  // bk -> (bfk, bv)
  private type JRow = (Long, Long, Long, Long, Long) // ak, av, bk, bfk, bv

  private def aDF(m: ARel): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (k, v) => (k, v) }.toDF("ak", "av")
  }
  private def bDF(m: BRel): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (k, (f, v)) => (k, f, v) }.toDF("bk", "bfk", "bv")
  }
  private def dADF(rows: Seq[(Long, Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ak", "av", "sign")
  }
  private def dBDF(rows: Seq[(Long, Long, Long, Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("bk", "bfk", "bv", "sign")
  }

  /** From-scratch inner join of the keyed states, as a multiset. */
  private def recompute(a: ARel, b: BRel): Map[JRow, Int] =
    (for { (bk, (bfk, bv)) <- b.toSeq; av <- a.get(bfk) }
      yield (bfk, av, bk, bfk, bv))
      .groupBy(identity).map { case (r, hits) => r -> hits.size }

  /** Fold signed joined-delta rows into the maintained multiset. */
  private def fold(view: Map[JRow, Int], delta: Seq[(JRow, Int)]): Map[JRow, Int] =
    delta.foldLeft(view) { case (m, (r, sgn)) =>
      m.updated(r, m.getOrElse(r, 0) + sgn)
    }.filter(_._2 != 0)

  private def collectDelta(df: DataFrame): Seq[(JRow, Int)] =
    df.collect().toSeq.map { r =>
      ((r.getAs[Long]("ak"), r.getAs[Long]("av"), r.getAs[Long]("bk"),
        r.getAs[Long]("bfk"), r.getAs[Long]("bv")), r.getAs[Int]("sign"))
    }

  /** Apply a keyed-relation mutation and emit its signed CDF rows. */
  private def mutateA(a: ARel, rnd: scala.util.Random,
      keyPool: Seq[Long]): (ARel, Seq[(Long, Long, Int)]) = {
    val k = keyPool(rnd.nextInt(keyPool.size))
    (a.get(k), rnd.nextInt(3)) match {
      case (None, _) => // insert
        val v = rnd.nextLong(1000)
        (a.updated(k, v), Seq((k, v, 1)))
      case (Some(old), 0) => // delete
        (a.removed(k), Seq((k, old, -1)))
      case (Some(old), _) => // update (pre −1, post +1)
        val v = rnd.nextLong(1000)
        (a.updated(k, v), Seq((k, old, -1), (k, v, 1)))
    }
  }

  private def mutateB(b: BRel, rnd: scala.util.Random,
      keyPool: Seq[Long]): (BRel, Seq[(Long, Long, Long, Int)]) = {
    val bk = rnd.nextLong(40)
    (b.get(bk), rnd.nextInt(3)) match {
      case (None, _) =>
        val (f, v) = (keyPool(rnd.nextInt(keyPool.size)), rnd.nextLong(1000))
        (b.updated(bk, (f, v)), Seq((bk, f, v, 1)))
      case (Some((f, v)), 0) =>
        (b.removed(bk), Seq((bk, f, v, -1)))
      case (Some((f, v)), _) => // update: maybe a join-key (fk) MOVE
        val nf = if (rnd.nextBoolean()) keyPool(rnd.nextInt(keyPool.size)) else f
        val nv = rnd.nextLong(1000)
        (b.updated(bk, (nf, nv)), Seq((bk, f, v, -1), (bk, nf, nv, 1)))
    }
  }

  test("randomized intervals: fold of joinDelta equals full recompute after every interval") {
    val rnd = new scala.util.Random(20260813L)
    val keyPool: Seq[Long] = 1L to 12L // small pool → frequent key collisions
    var a: ARel = (1L to 6L).map(k => k -> rnd.nextLong(1000)).toMap
    var b: BRel = (1L to 15L)
      .map(bk => bk -> (keyPool(rnd.nextInt(keyPool.size)), rnd.nextLong(1000))).toMap
    var view = recompute(a, b)

    for (interval <- 1 to 12) {
      val (a0, b0) = (a, b)
      // randomize WHICH side changes: A only / B only / both (incl. neither
      // never happens here — the explicit empty-delta test covers it)
      val sides = rnd.nextInt(3)
      var (dA, dB) = (Seq.empty[(Long, Long, Int)], Seq.empty[(Long, Long, Long, Int)])
      if (sides != 1) (1 to (1 + rnd.nextInt(3))).foreach { _ =>
        val (na, d) = mutateA(a, rnd, keyPool); a = na; dA ++= d
      }
      if (sides != 0) (1 to (1 + rnd.nextInt(3))).foreach { _ =>
        val (nb, d) = mutateB(b, rnd, keyPool); b = nb; dB ++= d
      }
      // every third interval, FORCE the correctness-critical cross-term
      // case: both sides of the SAME join key change in one interval
      if (interval % 3 == 0) {
        val k = keyPool(rnd.nextInt(keyPool.size))
        val (na, da) = mutateA(a.updated(k, a.getOrElse(k, 7L)), rnd, Seq(k))
        val aSeed = if (a.contains(k)) Seq.empty else Seq((k, 7L, 1))
        a = na; dA ++= aSeed ++ da
        val bk = 100L + interval
        b = b.updated(bk, (k, 42L)); dB ++= Seq((bk, k, 42L, 1))
      }

      val delta = collectDelta(joinDelta(
        aDF(a0), dADF(dA), bDF(b), dBDF(dB),
        keysA = Seq("ak"), keysB = Seq("bfk")))
      view = fold(view, delta)
      assert(view == recompute(a, b),
        s"interval $interval (sides=$sides): maintained view diverged\n" +
          s"dA=$dA\ndB=$dB\nb0=$b0\na0=$a0")
    }
  }

  test("broadcastDeltas=false (bulk-backfill plan) computes the identical delta") {
    val a0: ARel = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
    val b0: BRel = Map(100L -> (1L, 5L), 101L -> (2L, 6L), 102L -> (3L, 7L))
    val a1 = a0.updated(1L, 11L).removed(3L)
    val b1 = b0.updated(100L, (2L, 9L)) + (103L -> (1L, 8L))
    val dA = Seq((1L, 10L, -1), (1L, 11L, 1), (3L, 30L, -1))
    val dB = Seq((100L, 1L, 5L, -1), (100L, 2L, 9L, 1), (103L, 1L, 8L, 1))
    val broadcasted = collectDelta(joinDelta(
      aDF(a0), dADF(dA), bDF(b1), dBDF(dB), Seq("ak"), Seq("bfk")))
    val shuffled = collectDelta(joinDelta(
      aDF(a0), dADF(dA), bDF(b1), dBDF(dB), Seq("ak"), Seq("bfk"),
      broadcastDeltas = false))
    assert(shuffled.groupBy(identity).view.mapValues(_.size).toMap ==
      broadcasted.groupBy(identity).view.mapValues(_.size).toMap,
      "the broadcast knob is a physical-plan choice, never a semantic one")
    assert(fold(recompute(a0, b0), shuffled) == recompute(a1, b1))
  }

  test("empty deltas: one side unchanged, and both unchanged, are exact no-ops") {
    val a: ARel = Map(1L -> 10L, 2L -> 20L)
    val b: BRel = Map(100L -> (1L, 5L), 101L -> (2L, 6L), 102L -> (1L, 7L))
    val view = recompute(a, b)

    // B changes, A's delta is an EMPTY frame with the right schema
    val b1 = b.updated(103L, (2L, 9L)).removed(102L)
    val dB = Seq((103L, 2L, 9L, 1), (102L, 1L, 7L, -1))
    val d1 = collectDelta(joinDelta(aDF(a), dADF(Seq.empty), bDF(b1), dBDF(dB),
      keysA = Seq("ak"), keysB = Seq("bfk")))
    assert(fold(view, d1) == recompute(a, b1))

    // both sides unchanged → the delta itself must be EMPTY
    val d2 = joinDelta(aDF(a), dADF(Seq.empty), bDF(b), dBDF(Seq.empty),
      keysA = Seq("ak"), keysB = Seq("bfk"))
    assert(d2.count() == 0L)
  }

  test("swapped arguments (A₁ for A₀) double-counts when both sides of a key change — the asymmetry is load-bearing") {
    // one key, both sides update in the same interval
    val a0: ARel = Map(1L -> 10L)
    val b0: BRel = Map(100L -> (1L, 5L))
    val a1 = a0.updated(1L, 11L)
    val b1 = b0.updated(100L, (1L, 6L))
    val dA = Seq((1L, 10L, -1), (1L, 11L, 1))
    val dB = Seq((100L, 1L, 5L, -1), (100L, 1L, 6L, 1))
    val view = recompute(a0, b0)

    val good = fold(view, collectDelta(joinDelta(
      aDF(a0), dADF(dA), bDF(b1), dBDF(dB), Seq("ak"), Seq("bfk"))))
    assert(good == recompute(a1, b1))

    // WRONG form: new-A with new-B counts the ΔA⋈ΔB cross term twice
    val bad = fold(view, collectDelta(joinDelta(
      aDF(a1), dADF(dA), bDF(b1), dBDF(dB), Seq("ak"), Seq("bfk"))))
    assert(bad != recompute(a1, b1),
      "A₁⋈ΔB + ΔA⋈B₁ must NOT reproduce the recompute — if it does, the " +
        "spec's cross-term fixture stopped exercising the asymmetry")
  }

  test("signed() maps CDF change types to ±1 and rejects plain updates") {
    import spark.implicits._
    val cdf = Seq(
      (1L, "insert"), (2L, "update_postimage"),
      (3L, "delete"), (4L, "update_preimage"))
      .toDF("id", "change_type")
    val got = ViewMaintain.signed(cdf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("sign")).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> -1, 4L -> -1))

    val plain = Seq((1L, "update")).toDF("id", "change_type")
    val ex = intercept[Exception] { ViewMaintain.signed(plain).collect() }
    assert(ex.getMessage.contains("preImages") ||
      Option(ex.getCause).exists(_.getMessage.contains("preImages")))
  }
}

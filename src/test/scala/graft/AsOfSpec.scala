package graft

import graft.ops.AsOf

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of left join: ≤ semantics, exact-time match, no-prior → null") {
    val left = Seq(
      (1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 15L),
      (4L, 2L, 7L),  // user 2 has no purchase before 7
      (5L, 2L, 20L)).toDF("event_id", "user_id", "es")
    val right = Seq(
      (1L, 10L, 10L, 1.5), // exact-time: visible to left at es=10
      (1L, 12L, 12L, 2.5),
      (2L, 9L, 9L, 9.9)).toDF("user_id", "es", "p_es", "p_value")

    val out = AsOf.asofJoinLeft(left, right, "user_id", "es", "es",
        Seq("p_es", "p_value"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

    assert(out(1L) == None)        // es=5: before any purchase
    assert(out(2L) == Some(10L))   // es=10: the equal-time purchase matches
    assert(out(3L) == Some(12L))   // es=15: latest ≤ 15
    assert(out(4L) == None)        // user 2, es=7: purchase at 9 is later
    assert(out(5L) == Some(9L))    // user 2, es=20
  }

  test("as-of: NULL payload on the matched row survives; all cols from ONE row") {
    // purchase at es=10 has value 1.5; purchase at es=12 has NULL value.
    // A left row at es=15 matches the es=12 row, so it must get
    // (p_es=12, p_value=NULL) — NOT the stale 1.5 from es=10.
    val left = Seq((1L, 1L, 15L)).toDF("event_id", "user_id", "es")
    val right = Seq(
      (1L, 10L, 10L, Some(1.5)),
      (1L, 12L, 12L, None: Option[Double])).toDF("user_id", "es", "p_es", "p_value")

    val r = AsOf.asofJoinLeft(left, right, "user_id", "es", "es",
      Seq("p_es", "p_value")).head()
    assert(r.getLong(3) == 12L)
    assert(r.isNullAt(4), "matched row's NULL payload must survive")
  }

  test("NULL times: right NULL-time rows never match; left NULL-time rows get NULL payload") {
    val left = Seq(
      (1L, 1L, Some(5L)),
      (2L, 1L, None: Option[Long])).toDF("event_id", "user_id", "es")
    val right = Seq(
      (1L, None: Option[Long], 99L, 9.9), // positionless: must never match
      (1L, Some(3L), 3L, 1.0)).toDF("user_id", "es", "p_es", "p_value")

    for (fwd <- Seq(false, true)) {
      val fn = if (fwd) AsOf.asofJoinLeftForward _ else AsOf.asofJoinLeft _
      val out = fn(left, right, "user_id", "es", "es", Seq("p_es", "p_value"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      // left es=5: backward matches t'=3; forward has no t' ≥ 5 (99 is
      // the NULL-time row's PAYLOAD, not a time)
      assert(out(1L) == (if (fwd) None else Some(3L)), s"fwd=$fwd")
      // left NULL time: no as-of position in either direction
      assert(out(2L) == None, s"fwd=$fwd: NULL-time left row must get NULL payload")
    }
  }

  test("forward as-of: ≥ semantics, exact-time match, no-following → null") {
    val left = Seq(
      (1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 15L),
      (4L, 2L, 7L),
      (5L, 2L, 20L)).toDF("event_id", "user_id", "es") // user 2: nothing after 20
    val right = Seq(
      (1L, 10L, 10L, 1.5), // exact-time: visible to left at es=10
      (1L, 12L, 12L, 2.5),
      (2L, 9L, 9L, 9.9)).toDF("user_id", "es", "p_es", "p_value")

    val out = AsOf.asofJoinLeftForward(left, right, "user_id", "es", "es",
        Seq("p_es", "p_value"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap

    assert(out(1L) == Some(10L))   // es=5: nearest following is 10, not 12
    assert(out(2L) == Some(10L))   // es=10: the equal-time purchase matches
    assert(out(3L) == None)        // es=15: nothing at-or-after
    assert(out(4L) == Some(9L))    // user 2, es=7 → purchase at 9
    assert(out(5L) == None)        // user 2, es=20: purchase at 9 is earlier
  }

  test("duality on real data: forward as-of ≡ backward as-of on negated time") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, Sf001).select(
      col("event_id"), col("user_id"), col("value"),
      unix_timestamp(col("ts")).as("es"))
    val purchases = graft.ops.MergeOps.latestByKey(
        e.filter(col("value") > 150), // arbitrary deterministic right side
        Seq("user_id", "es"), Seq(col("event_id")))
      .select(col("user_id"), col("es"), col("value").as("p_value"))
    val left = e.select(col("event_id"), col("user_id"), col("es"))

    val fwd = AsOf.asofJoinLeftForward(left, purchases,
        "user_id", "es", "es", Seq("p_value"))
      .select(col("event_id"), col("p_value"))
    val bwdNeg = AsOf.asofJoinLeft(
        left.withColumn("es", -col("es")),
        purchases.withColumn("es", -col("es")),
        "user_id", "es", "es", Seq("p_value"))
      .select(col("event_id"), col("p_value"))

    assert(fwd.except(bwdNeg).isEmpty && bwdNeg.except(fwd).isEmpty)
  }
}

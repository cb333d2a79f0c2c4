package graft

import graft.ops.AggMaintain
import org.apache.spark.sql.functions._

class AggMaintainSpec extends SparkTestBase {
  import spark.implicits._

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    AggMaintain.deltaAggregates(df, Seq("k"),
      sums = Map("s" -> col("v").cast("decimal(18,2)")),
      mins = Map("mn" -> col("v")), maxs = Map("mx" -> col("v")))

  test("applyDelta: incremental merge ≡ full recompute; disjoint keys pass through") {
    val all = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0), ("c", 7.0), ("c", -1.0))
      .toDF("k", "v")
    val state = rollup(all.limit(2))            // a,a
    val delta = rollup(all.exceptAll(all.limit(2))) // b,c,c — b,c absent from state
    val merged = AggMaintain.applyDelta(state, delta, Seq("k"),
        Seq("s"), Seq("mn"), Seq("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue, r.getDouble(3), r.getDouble(4))).toMap
    val full = rollup(all)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue, r.getDouble(3), r.getDouble(4))).toMap
    assert(merged == full)
  }

  test("applyDelta: validateKeys catches a violated assumeKeysNonNull assertion") {
    val state = Seq(("a", 1L, BigDecimal(1.0))).toDF("k", "count_rows", "s")
    val badDelta = Seq((null.asInstanceOf[String], 1L, BigDecimal(2.0)))
      .toDF("k", "count_rows", "s")
    intercept[IllegalArgumentException] {
      AggMaintain.applyDelta(state, badDelta, Seq("k"), Seq("s"),
        assumeKeysNonNull = true, validateKeys = true)
    }
    // clean delta passes with validation on
    val ok = Seq(("b", 1L, BigDecimal(2.0))).toDF("k", "count_rows", "s")
    assert(AggMaintain.applyDelta(state, ok, Seq("k"), Seq("s"),
      assumeKeysNonNull = true, validateKeys = true).count() == 2)
  }

  test("applyDelta: additive retraction (negative counts/sums) shrinks state") {
    val state = Seq(("a", 3L, BigDecimal(10.0))).toDF("k", "count_rows", "s")
    val retract = Seq(("a", -1L, BigDecimal(-4.0))).toDF("k", "count_rows", "s")
    val out = AggMaintain.applyDelta(state, retract, Seq("k"), Seq("s")).head()
    assert(out.getLong(1) == 2L)
    assert(out.getDecimal(2).doubleValue == 6.0)
  }

  test("applyDelta: a fully-retracted key disappears, matching recompute") {
    val state = Seq(("a", 3L, BigDecimal(10.0)), ("b", 1L, BigDecimal(2.0)))
      .toDF("k", "count_rows", "s")
    val retract = Seq(("a", -3L, BigDecimal(-10.0))).toDF("k", "count_rows", "s")
    val out = AggMaintain.applyDelta(state, retract, Seq("k"), Seq("s"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("b"), "retracted-to-zero key must not leave a ghost row")
  }
}

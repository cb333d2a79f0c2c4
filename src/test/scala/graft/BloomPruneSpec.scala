package graft

import graft.ops.BloomPrune
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkTestBase {

  test("prunedByBloom: no false negatives — bloom + exact join ≡ exact join") {
    val li = Tables.lineitem(spark, Sf001)
    val sel = Tables.orders(spark, Sf001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val pruned = BloomPrune.prunedByBloom(
      li, col("l_orderkey"), sel, col("o_orderkey"),
      expectedItems = 10000L, numBits = 1L << 18)
    val viaBloom = pruned.join(sel, col("l_orderkey") === col("o_orderkey")).count()
    val direct = li.join(sel, col("l_orderkey") === col("o_orderkey")).count()
    assert(viaBloom == direct, "bloom prefilter lost true matches")

    // a pathologically undersized filter (64 bits for thousands of keys,
    // fp rate ≈ 1) must STILL never lose a true match — false positives
    // cost bytes, false negatives would be wrong answers
    val tiny = BloomPrune.prunedByBloom(
      li, col("l_orderkey"), sel, col("o_orderkey"),
      expectedItems = 8L, numBits = 64L)
    val viaTiny = tiny.join(sel, col("l_orderkey") === col("o_orderkey")).count()
    assert(viaTiny == direct, "undersized bloom lost true matches")
  }

  test("prunedByBloom actually prunes, and the probe filter sits in the plan") {
    val li = Tables.lineitem(spark, Sf001)
    val sel = Tables.orders(spark, Sf001)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 250000)
      .select(col("o_orderkey"))
    val pruned = BloomPrune.prunedByBloom(
      li, col("l_orderkey"), sel, col("o_orderkey"),
      expectedItems = 10000L, numBits = 1L << 20)
    val total = li.count()
    val kept = pruned.count()
    // the build side keeps a small fraction of orders; at 2^20 bits the
    // fp rate is ~0, so the kept fraction tracks true selectivity
    assert(kept < total / 2, s"no pruning happened: $kept of $total")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"probe filter missing from plan:\n$p")
  }
}

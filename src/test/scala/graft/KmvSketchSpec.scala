package graft

import graft.plans.KmvSketch
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("fewer distinct values than k → exact count") {
    val df = spark.range(1000).select(($"id" % 37).as("v"))
    val est = df.agg(KmvSketch.distinctEstimate($"v", 64)).head().getDouble(0)
    assert(est == 37.0)
  }

  test("estimate within 30% for 10k distinct at k=64, invariant to partitioning") {
    val df = spark.range(100000).select(($"id" % 10000).as("v"))
    val e1 = df.agg(KmvSketch.distinctEstimate($"v", 64)).head().getDouble(0)
    val e2 = df.repartition(13).agg(KmvSketch.distinctEstimate($"v", 64)).head().getDouble(0)
    assert(e1 == e2, "sketch must be order/partitioning-invariant")
    assert(math.abs(e1 - 10000) / 10000.0 < 0.3, s"estimate $e1 too far from 10000")
  }

  test("merge path: union of shards equals single-pass sketch") {
    val all = spark.range(5000).select(($"id" % 777).as("v"))
    val single = all.coalesce(1).agg(KmvSketch.distinctEstimate($"v", 32)).head().getDouble(0)
    val sharded = all.repartition(8).agg(KmvSketch.distinctEstimate($"v", 32)).head().getDouble(0)
    assert(single == sharded)
  }

  test("string inputs: md5-prefix pre-hash, exact below k, JVM/expression lock-step") {
    val df = spark.range(2000).select(concat(lit("user-"), ($"id" % 41)).as("s"))
    // 41 distinct strings < k → exact
    val est = df.agg(KmvSketch.distinctEstimate($"s", 64)).head().getDouble(0)
    assert(est == 41.0, s"string sketch below k must be exact, got $est")
    // the aggregate's JVM hash must equal hashCol's expression form —
    // maintenance's retraction check depends on the lock-step
    val viaExpr = df.select(KmvSketch.hashCol($"s",
        org.apache.spark.sql.types.StringType).as("h"))
      .distinct().collect().map(_.getLong(0)).toSet
    val viaJvm = (0 until 41).map(i => KmvSketch.hash(KmvSketch.md5Prefix60(
      s"user-$i".getBytes("UTF-8")))).toSet
    assert(viaExpr == viaJvm, "hashCol(String) diverged from hashOf")
    // saturated estimate is partitioning-invariant for strings too
    val big = spark.range(50000).select(concat(lit("u"), ($"id" % 7000)).as("s"))
    val e1 = big.agg(KmvSketch.distinctEstimate($"s", 64)).head().getDouble(0)
    val e2 = big.repartition(11).agg(KmvSketch.distinctEstimate($"s", 64)).head().getDouble(0)
    assert(e1 == e2 && math.abs(e1 - 7000) / 7000.0 < 0.35, s"string estimate $e1")
  }

  test("non-orderable input types still fail at analysis") {
    val df = spark.range(10).select(($"id" / 2.0).as("v"))
    val ex = intercept[Exception] {
      df.agg(KmvSketch.distinctEstimate($"v", 8)).collect()
    }
    assert(ex.getMessage.contains("integral or string"),
      s"expected an analysis-time type error, got: ${ex.getMessage}")
  }
}

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
}

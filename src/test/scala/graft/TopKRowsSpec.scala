package graft

import graft.plans.TopKRows
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKRowsSpec extends SparkTestBase {
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy($"o_custkey")
    .agg(TopKRows.topK(struct(negate($"o_totalprice").as("np"), $"o_orderkey"), k).as("tk"))
    .select($"o_custkey", posexplode($"tk"))
    .select($"o_custkey", ($"pos" + 1).cast("long").as("rk"),
      $"col.o_orderkey".as("o_orderkey"), negate($"col.np").as("price"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .withColumn("rk", row_number().over(
      Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")))
    .filter($"rk" <= k)
    .select($"o_custkey", $"rk".cast("long").as("rk"), $"o_orderkey",
      $"o_totalprice".as("price"))

  test("topK aggregate ≡ window row_number on real orders, any partitioning") {
    val orders = Tables.orders(spark, Sf001)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val want = viaWindow(orders, 3).collect().toSet
    assert(want.nonEmpty)
    assert(viaAgg(orders, 3).collect().toSet == want)
    // partitioning must not change the result (merge path exercised for real)
    assert(viaAgg(orders.repartition(17, $"o_orderkey"), 3).collect().toSet == want)
    assert(viaAgg(orders.repartition(1), 3).collect().toSet == want)
  }

  test("groups smaller than k return all their rows, ranked") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (2L, 20L, 1.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val got = viaAgg(df, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((1L, 1L, 11L, 7.0), (1L, 2L, 10L, 5.0), (2L, 1L, 20L, 1.0)))
  }

  test("the partial aggregate shrinks groups before the exchange (no window sort)") {
    val orders = Tables.orders(spark, Sf001)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val q = viaAgg(orders, 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "must not plan a window")
    // two ObjectHashAggregates (partial below the exchange, final above):
    // the partial instance is what shrinks each group to ≤k pre-shuffle
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("topkrows"), plan)
  }

  test("k=1 degenerates to per-group argmin; duplicate sort keys keep one stable row") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 9.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    // ties on price break by o_orderkey (total ordering) → row 12 wins on
    // price, and of the 5.0 ties orderkey 10 ranks first
    val got = viaAgg(df, 2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 12L), (2L, 10L)))
  }
}

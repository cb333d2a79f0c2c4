package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (builder brief: "repartition()/bucketing
  * for co-located joins"): both tables bucketed+sorted on the join key join
  * with NO shuffle exchange — at 100 TB this removes the dominant cost of
  * every fact-fact join.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without a shuffle exchange") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
    // a previously interrupted run can leave the managed location behind
    // after DROP TABLE removed only the metadata
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), s"$db.db")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (wh.exists()) rm(wh)

    Tables.orders(spark, Sf001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_b")
    Tables.lineitem(spark, Sf001)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.lineitem_b")

    // force a non-broadcast join so the exchange-free plan is attributable
    // to bucketing, not to the tiny test tables broadcasting
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table(s"$db.orders_b")
      .join(spark.table(s"$db.lineitem_b"), Seq("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    try joined.collect()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(plan).length
    assert(exchanges == 0, s"bucketed join still shuffles on the join key:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

    // same answer as the unbucketed join
    val want = Tables.orders(spark, Sf001)
      .join(Tables.lineitem(spark, Sf001),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    assert(joined.collect().map(_.toSeq).toSet == want)
  }
}

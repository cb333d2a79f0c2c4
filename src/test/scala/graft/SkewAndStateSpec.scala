package graft

import graft.ops.Skew
import graft.queries.Registry
import graft.streaming.StatefulSessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SkewAndStateSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregation equals plain groupBy on a pathologically skewed key") {
    // 90% of rows on one key
    val skewed = spark.range(10000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(0L).as("k"),
        ($"id" % 100).cast("double").as("v"), $"id")
    val salted = Skew.saltedSumCount(skewed, "k", $"v", $"id", salts = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val plain = skewed.groupBy("k").agg(sum($"v").as("sum"), count(lit(1)).as("count"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on a skewed fact") {
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b")).toDF("k", "name")
    val fact = spark.range(5000)
      .select(when($"id" % 10 === 0, $"id" % 3).otherwise(0L).as("k"), $"id")
    val salted = Skew.saltedJoin(fact, dim, "k", $"id", salts = 8)
      .select($"id", $"name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = fact.join(dim, Seq("k")).select($"id", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("salted join plans a (key, salt) shuffle join when broadcast is off") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b")).toDF("k", "name")
      val fact = spark.range(5000)
        .select(when($"id" % 10 === 0, $"id" % 3).otherwise(0L).as("k"), $"id")
      val p = Skew.saltedJoin(fact, dim, "k", $"id", salts = 8)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"), s"salting bypassed by broadcast:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle join:\n$p")
      // the shuffle key must carry the salt, or the hot key still lands
      // on one reducer
      assert(raw"(?s)(SortMergeJoin|ShuffledHashJoin)\s*\[[^\]]*__salt".r
        .findFirstIn(p).isDefined, s"join keys lack __salt:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("flatMapGroupsWithState sessionization matches the batch e1 query") {
    implicit val sqlCtx = spark.sqlContext
    // batch ground truth over sf0.001 events
    val want = Registry.all.find(_.name == "e1_sessionize").get.fn(spark, Sf001)
      .select($"user_id", $"session_id", $"n_events", $"session_start_epoch")
      .collect().map(_.toSeq).toSet

    val evs = Tables.events(spark, Sf001)
      .select($"user_id", unix_timestamp($"ts".cast("timestamp")).as("es"), $"event_id")
      .as[StatefulSessions.Event].collect().toSeq
    val users = evs.map(_.user_id).distinct
    val maxEs = evs.map(_.es).max

    val input = MemoryStream[StatefulSessions.Event]
    val out = StatefulSessions.sessionize(input.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_stream").start()
    try {
      // two micro-batches (split mid-stream) + the end-of-stream flush
      val (b1, b2) = evs.sortBy(e => (e.es, e.event_id)).splitAt(evs.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(StatefulSessions.flushEvents(users, maxEs)); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions_stream")
      .select($"user_id", $"session_id", $"n_events", $"session_start_epoch")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }
}

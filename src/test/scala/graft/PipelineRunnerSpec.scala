package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class PipelineRunnerSpec extends SparkTestBase {

  test("two incremental runs: SCD2 versions evolve, facts append-only, re-run is a no-op") {
    val work = Files.createTempDirectory("pipeline")
    val l = PipelineRunner.layers(work)

    // run 1: first half of January, orders through 1997
    PipelineRunner.run(spark, Sf001, work,
      "2024-01-15 00:00:00", "1997-12-31", "2024-02-01 00:00:00")
    val dim1 = graft.ops.Storage.readVersion(spark, l.dimUsers).collect()
    val fact1 = graft.ops.Storage.readPartitionedVersion(spark, l.factOrders)
    val fact1Count = fact1.count()
    assert(dim1.nonEmpty && fact1Count > 0)
    // initial load: every user exactly one current version
    assert(dim1.forall(_.getAs[Boolean]("is_current")))

    // run 2: full month, all orders — profiles change, new orders appear
    PipelineRunner.run(spark, Sf001, work,
      "2024-01-30 23:59:59", "2001-12-31", "2024-03-01 00:00:00")
    val dim2 = graft.ops.Storage.readVersion(spark, l.dimUsers)
    val fact2 = graft.ops.Storage.readPartitionedVersion(spark, l.factOrders)

    // SCD2: exactly one current version per user; closed versions exist
    assert(dim2.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") =!= 1).count() == 0)
    assert(dim2.filter(!col("is_current")).count() > 0, "no versions were closed")
    // closed versions end at run 2's timestamp
    assert(dim2.filter(!col("is_current"))
      .filter(col("valid_to") =!= lit("2024-03-01 00:00:00").cast("timestamp"))
      .count() == 0)
    // facts: append-only (run-1 rows still present, stamped with run-1 ts)
    assert(fact2.count() > fact1Count)
    assert(fact2.filter(col("inserted_at") === lit("2024-02-01 00:00:00").cast("timestamp"))
      .count() == fact1Count)
    // SKs unique across the whole dimension
    val sks = dim2.select("sk").collect().map(_.getLong(0))
    assert(sks.distinct.length == sks.length)

    // run 2 again (same asOf, later runTs): every layer unchanged
    val dimBefore = dim2.collect().toSet
    val factBefore = fact2.collect().toSet
    PipelineRunner.run(spark, Sf001, work,
      "2024-01-30 23:59:59", "2001-12-31", "2024-04-01 00:00:00")
    assert(graft.ops.Storage.readVersion(spark, l.dimUsers).collect().toSet == dimBefore)
    assert(graft.ops.Storage.readPartitionedVersion(spark, l.factOrders).collect().toSet == factBefore)

    // commit log across runs: 3 runs = versions 0..2 per layer; run-2's
    // state is still readable via time travel (keep-window), and equals
    // the current state because run 3 was a no-op
    assert(graft.ops.Storage.currentVersion(l.dimUsers).contains(2L))
    assert(graft.ops.Storage.readVersionAt(spark, l.dimUsers, 1).collect().toSet == dimBefore)

    // stg write pruning: the no-op re-run had an EMPTY high-watermark
    // delta, so its pruned-upsert commit rewrote ZERO buckets — the new
    // version directory holds no partition dirs, everything carried by
    // manifest reference
    def rewrittenParts(table: java.nio.file.Path, prefix: String): Int = {
      val v = graft.ops.Storage.currentVersion(table).get
      val s0 = java.nio.file.Files.list(table.resolve(s"v$v"))
      try s0.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .count(_.startsWith(prefix))
      finally s0.close()
    }
    assert(rewrittenParts(l.stgUsers, "pbucket=") == 0,
      "no-op run must rewrite no stg buckets")

    // fact write pruning: append-only facts land in per-run load_epoch
    // partitions; the no-op run appended nothing, so its version rewrote
    // zero partitions — the whole fact table carries by reference
    assert(rewrittenParts(l.factOrders, "load_epoch=") == 0,
      "no-op run must rewrite no fact partitions")
  }

  test("reusing a runTs with NEW facts fails loudly instead of replacing the epoch partition") {
    val work = Files.createTempDirectory("pipeline_epoch")
    PipelineRunner.run(spark, Sf001, work,
      "2024-01-15 00:00:00", "1997-12-31", "2024-02-01 00:00:00")
    // wider asOf finds new orders; same runTs would overwrite their epoch
    intercept[IllegalStateException] {
      PipelineRunner.run(spark, Sf001, work,
        "2024-01-20 00:00:00", "2001-12-31", "2024-02-01 00:00:00")
    }
    // a distinct runTs proceeds normally
    PipelineRunner.run(spark, Sf001, work,
      "2024-01-20 00:00:00", "2001-12-31", "2024-02-15 00:00:00")
  }

  test("maintain: metadata-judged compaction no-ops on healthy layers; TTL expires aged fact epochs") {
    val work = Files.createTempDirectory("pipeline_maint")
    val l = PipelineRunner.layers(work)
    PipelineRunner.run(spark, Sf001, work,
      "2024-01-15 00:00:00", "1997-12-31", "2024-02-01 00:00:00")
    PipelineRunner.run(spark, Sf001, work,
      "2024-01-30 23:59:59", "2001-12-31", "2024-03-01 00:00:00")
    val versionsBefore = Seq(l.stgUsers, l.dimUsers, l.factOrders)
      .map(graft.ops.Storage.currentVersion)

    // an aggregate view of the fact table rides the SAME maintenance
    // pass: bootstrap on first sight, exact roll-forward afterwards
    import graft.ops.MatViews
    val factView = work.resolve("dm_orders_by_user")
    val views = Seq(PipelineRunner.ViewMaintenance(l.factOrders,
      pk = Seq("o_orderkey"),
      specs = Seq(MatViews.ViewSpec(factView, keys = Seq("user_sk"),
        mins = Map("o_totalprice" -> "min_price"),
        maxs = Map("o_totalprice" -> "max_price"),
        counts = Map("o_totalprice" -> "cnt_price"), keepVersions = 2))))
    def assertViewExact(): Unit = {
      val got = graft.ops.Storage.readVersion(spark, factView)
        .select("user_sk", "count_rows", "min_price", "max_price", "cnt_price")
        .collect().map(_.toSeq).toSet
      val want = graft.ops.Storage.readPartitionedVersion(spark, l.factOrders)
        .groupBy("user_sk")
        .agg(count(lit(1)).as("count_rows"), min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          count(col("o_totalprice")).as("cnt_price"))
        .collect().map(_.toSeq).toSet
      assert(got == want, s"fact view diverged:\n got  $got\n want $want")
    }

    // maintenance with nothing due: every compaction trigger judges the
    // layers healthy from log metadata, the TTL keeps both epochs — and
    // crucially NO layer burns a version slot (the convergence contract)
    val r1 = PipelineRunner.maintain(spark, work, views = views)
    assert(r1.compacted.values.forall(_.isEmpty), r1.toString)
    assert(Seq(l.stgUsers, l.dimUsers, l.factOrders)
      .map(graft.ops.Storage.currentVersion) == versionsBefore,
      "a no-op maintenance pass must not commit")
    assert(r1.views.contains(factView.toString), r1.toString)
    assertViewExact()

    // TTL: drop run 1's epoch, keep run 2's — one metadata commit on the
    // fact table only
    val epochs = graft.ops.Storage.committedPartitions(l.factOrders)
      .map(_.split("=", 2)(1).toLong)
    assert(epochs.size == 2, s"fixture expects two run epochs, got $epochs")
    val keepFrom = epochs.max
    val r2 = PipelineRunner.maintain(spark, work, keepEpoch = _ >= keepFrom,
      views = views)
    assert(r2.expiredFactVersion.exists(v => versionsBefore(2).exists(_ < v)),
      s"expiry must land as a new fact commit: $r2")
    val facts = graft.ops.Storage.readPartitionedVersion(spark, l.factOrders)
    assert(facts.filter(col("load_epoch") =!= keepFrom).count() == 0,
      "expired epoch rows must be gone")
    assert(facts.count() > 0, "retained epoch must survive")
    // …and the view rolled THROUGH the expiry's retractions in the same
    // pass (min/max recomputes where a dropped epoch held the extreme)
    assertViewExact()
    // idempotence: the next scheduled pass has nothing to do
    val r3 = PipelineRunner.maintain(spark, work, keepEpoch = _ >= keepFrom,
      views = views)
    assert(r3.compacted.values.forall(_.isEmpty) &&
      r3.expiredFactVersion == graft.ops.Storage.currentVersion(l.factOrders),
      s"repeat maintenance must no-op: $r3")
    assertViewExact()
  }

  test("late-arriving events inside the lateness horizon are picked up by the next run") {
    import spark.implicits._
    val work = Files.createTempDirectory("pipeline_late")
    val data = Files.createTempDirectory("pipeline_late_raw")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(Sf001, "orders.parquet"), data.resolve("orders.parquet"))
    val ev = Tables.events(spark, Sf001)

    // the "late" slice: one user's events with ts in (Jan 14, Jan 15] —
    // they exist in the source but have NOT landed in raw when run 1 runs
    val window = col("ts") > lit("2024-01-14 00:00:00").cast("timestamp") &&
      col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp")
    val lateUser = ev.filter(window).select("user_id").head().getLong(0)
    val lateWindow = window && col("user_id") === lateUser
    ev.filter(!lateWindow).write.parquet(data.resolve("events.parquet").toString)
    PipelineRunner.run(spark, data.toString, work,
      "2024-01-15 00:00:00", "1997-12-31", "2024-02-01 00:00:00")

    // late slice lands in raw AFTER run 1's watermark (Jan 15) passed
    graft.ops.Storage.deleteRecursively(data.resolve("events.parquet"))
    ev.write.parquet(data.resolve("events.parquet").toString)
    // run 2's delta window re-opens watermark − 2 days = Jan 13, so the
    // late events (Jan 14–15) re-enter user 3's snapshot
    PipelineRunner.run(spark, data.toString, work,
      "2024-01-16 00:00:00", "1997-12-31", "2024-03-01 00:00:00")

    val l = PipelineRunner.layers(work)
    val got = graft.ops.Storage.readPartitionedVersion(spark, l.stgUsers)
      .filter(col("user_id") === lateUser)
      .select("event_type", "value").as[(String, Double)].collect().toSeq
    val want = ev.filter(col("user_id") === lateUser &&
        col("ts") <= lit("2024-01-16 00:00:00").cast("timestamp"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .select("event_type", "value").as[(String, Double)].head(1).toSeq
    assert(got == want, s"stg must reflect the late events: got $got want $want")
  }
}

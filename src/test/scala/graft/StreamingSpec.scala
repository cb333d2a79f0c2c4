package graft

import java.nio.file.Files

import graft.queries.Registry
import graft.streaming.StreamingLoads
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkTestBase {

  private def eventsStreamDir: String = {
    // streaming sources list directories; stage the single events file
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(
      java.nio.file.Paths.get(s"$Sf001/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  // the generator has shipped several physical encodings for events.ts
  // (long nanos, timestamp[us]/NTZ); read the schema off the actual parquet
  // footer and let Tables.normalizeEventTs handle whichever arrived
  private lazy val rawSchema: StructType =
    spark.read.parquet(s"$Sf001/events.parquet").schema

  private def eventsStream(dir: String) =
    Tables.normalizeEventTs(spark.readStream.schema(rawSchema).parquet(dir))

  test("watermark drops late data: an event older than the watermark never lands in its window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val stream = input.toDF().toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val q = StreamingLoads.windowedEventCounts(stream, watermark = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("late_drop").start()
    val h = 3600L
    try {
      // batch 1: one event at t=0h; batch 2 advances event time to t=12h
      // → watermark moves to 10h and the 0h window flushes with n=1
      input.addData(Seq((0L, "click", 1.0))); q.processAllAvailable()
      input.addData(Seq((12 * h, "click", 1.0))); q.processAllAvailable()
      // batch 3: a LATE straggler for the 0h window (beyond the 2h
      // watermark) plus a fresh event advancing time further
      input.addData(Seq((5L, "click", 99.0), (13 * h, "click", 1.0)))
      q.processAllAvailable()
      input.addData(Seq((24 * h, "click", 1.0))); q.processAllAvailable()
    } finally q.stop()
    val hour0 = spark.table("late_drop")
      .filter(unix_timestamp(col("window_start")) === 0L).collect()
    assert(hour0.length == 1, s"hour-0 window must emit exactly once: ${hour0.toSeq}")
    assert(hour0.head.getAs[Long]("n_events") == 1L,
      "the late straggler must be DROPPED, not merged (state was evicted)")
  }

  test("streaming windowed aggregation matches the batch e2 query") {
    val stream = eventsStream(eventsStreamDir)
    val q = StreamingLoads.windowedEventCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("e2_stream").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("e2_stream")
      .select(unix_timestamp(col("window_start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("total_value"))
      .collect().map(_.toSeq).toSet
    val want = Registry.all.find(_.name == "e2_hourly_windows").get
      .fn(spark, Sf001).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("streaming dedup: watermarked dropDuplicates emits each event_id once") {
    val dir = eventsStreamDir
    // duplicate the source file → every event arrives twice
    Files.copy(java.nio.file.Paths.get(s"$Sf001/events.parquet"),
      java.nio.file.Paths.get(dir).resolve("part-1.parquet"))
    val stream = eventsStream(dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("dedup_stream").count()
    val want = Tables.events(spark, Sf001).count()
    assert(n == want, s"expected $want deduped events, got $n")
  }

  test("streamingExactDedup: content-fingerprint dedup with BOUNDED state (within-watermark)") {
    val dir = eventsStreamDir
    Files.copy(java.nio.file.Paths.get(s"$Sf001/events.parquet"),
      java.nio.file.Paths.get(dir).resolve("part-1.parquet"))
    val stream = eventsStream(dir)
    val deduped = StreamingLoads.streamingExactDedup(
      stream, fingerprint = md5(concat_ws("|", col("event_id"), col("event_type"))),
      tsCol = "ts")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("fp_dedup_stream").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("fp_dedup_stream")
    // each duplicated event collapses to one row; schema passes through
    // (the internal __fp column is dropped)
    assert(out.count() == Tables.events(spark, Sf001).count())
    assert(out.columns.toSet == Set("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("stream-stream interval join matches the batch equivalent") {
    // click ⋈ purchase by user within [click_ts, click_ts + 1h] — both
    // sides watermarked so the join state is bounded (Spark requires the
    // time-interval condition + watermarks to age out buffered rows)
    val dir = eventsStreamDir
    def side(tpe: String, tsName: String) = eventsStream(dir)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id").as(s"${tsName}_id"), col("ts").as(tsName))
      .withWatermark(tsName, "2 hours")
    val left = side("click", "click_ts").as("c")
    val right = side("purchase", "p_ts").as("p")
    val stream = left.join(right,
      col("c.user_id") === col("p.user_id") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c.user_id"), col("click_ts_id"), col("p_ts_id"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ssj_stream").start()
    try q.processAllAvailable() finally q.stop()

    val ev = Tables.events(spark, Sf001)
    def bside(tpe: String, tsName: String) = ev.filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id").as(s"${tsName}_id"), col("ts").as(tsName))
    val want = bside("click", "click_ts").as("c").join(bside("purchase", "p_ts").as("p"),
        col("c.user_id") === col("p.user_id") &&
          col("p_ts") >= col("click_ts") &&
          col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c.user_id"), col("click_ts_id"), col("p_ts_id"))
      .collect().map(_.toSeq).toSet
    val got = spark.table("ssj_stream").collect().map(_.toSeq).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture should produce at least one joined pair")
  }

  test("streaming SCD2 via foreachBatch: two micro-batches evolve versions like batch merges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val dimDir = Files.createTempDirectory("stream_scd2")
    val dim = new StreamingLoads.Scd2Table(spark, "user_id", Seq("event_type"), dimDir)
    val input = MemoryStream[(Long, String, Long)]
    val stream = input.toDF().toDF("user_id", "event_type", "seq")
    // NOT AvailableNow: the test feeds two separate micro-batches after start
    val q = StreamingLoads.foreachBatchScd2(stream, dim, "user_id",
      Seq("event_type"), Seq("seq"),
      batchId => java.sql.Timestamp.valueOf(s"2024-0${batchId + 1}-01 00:00:00"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L, "click", 1L), (2L, "view", 2L))
      q.processAllAvailable()
      input.addData((1L, "purchase", 3L), (3L, "signup", 4L))
      q.processAllAvailable()
    } finally q.stop()

    val rows = dim.snapshot
      .select($"user_id", $"event_type", $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows == Set(
      (1L, "click", false),    // closed by batch 2
      (1L, "purchase", true),  // reopened
      (2L, "view", true),      // untouched by batch 2
      (3L, "signup", true)))   // new key in batch 2
    // one current version per key, unique SKs
    val cur = dim.snapshot.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(cur == 0)
  }

  test("crash recovery: checkpoint restart neither loses nor duplicates through foreachBatch + commit log") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("crash_src")
    val srcSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def feed(n: Int, rows: Seq[(Long, String, Double)]): Unit = {
      // the file source lists FILES, not subdirectories: stage the single
      // part-file into the source dir under a stable name
      val tmp = Files.createTempDirectory(s"crash_feed_$n")
      rows.toDF("user_id", "event_type", "value")
        .coalesce(1).write.parquet(tmp.resolve("w").toString)
      val s = Files.list(tmp.resolve("w"))
      val part =
        try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      Files.copy(part, srcDir.resolve(s"b$n.parquet"))
    }

    val stateSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("loaded_at", TimestampType), StructField("last_upd_at", TimestampType)))
    val stateDir = Files.createTempDirectory("crash_state")
    val ckpt = Files.createTempDirectory("crash_ckpt").toString
    val table = stateDir.resolve("state")
    // batch stamps must be a pure function of batchId: a RE-EXECUTED batch
    // then re-merges to the identical state (effectively-once)
    def ts(bid: Long) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$bid%02d")

    def runOnce(): StreamingLoads.StreamingTableState = {
      val state = new StreamingLoads.StreamingTableState(spark, stateSchema, stateDir)
      val stream = spark.readStream.schema(srcSchema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
        .select(col("user_id"), col("event_type"), col("value"),
          lit(null).cast("timestamp").as("loaded_at"),
          lit(null).cast("timestamp").as("last_upd_at"))
      val q = StreamingLoads.foreachBatchUpsert(stream, state,
          Seq("user_id"), Seq("event_type", "value"), ts)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      state
    }
    def snap(state: StreamingLoads.StreamingTableState) = state.snapshot
      .select($"user_id", $"event_type", $"value",
        unix_timestamp($"loaded_at").as("l"), unix_timestamp($"last_upd_at").as("u"))
      .collect().map(_.toSeq).toSet

    // ---- run 1: two micro-batches (maxFilesPerTrigger=1), then "crash"
    feed(0, Seq((1L, "a", 1.0), (2L, "a", 2.0)))
    feed(1, Seq((1L, "b", 3.0), (3L, "a", 4.0)))
    val s1 = runOnce()
    val afterRun1 = snap(s1)
    assert(afterRun1.map(r => (r(0), r(1))) ==
      Set((1L, "b"), (2L, "a"), (3L, "a")))
    assert(graft.ops.Storage.currentVersion(table).contains(1L), "2 batches = v0, v1")

    // ---- crash mode 1: foreachBatch is at-least-once — the last batch's
    // side effect may be RE-EXECUTED after a crash before the offset
    // commit. Deterministic per-batch stamps make the re-merge a no-op.
    s1.merge(
      Seq((1L, "b", 3.0), (3L, "a", 4.0)).toDF("user_id", "event_type", "value")
        .withColumn("loaded_at", lit(null).cast("timestamp"))
        .withColumn("last_upd_at", lit(null).cast("timestamp")),
      Seq("user_id"), Seq("event_type", "value"), lit(ts(1)))
    assert(snap(s1) == afterRun1, "re-executed batch must not change state")

    // ---- crash mode 2: a crash inside commitVersion leaves a promoted-
    // but-unpointed orphan; the restarted writer's startup repair clears it
    val orphan = table.resolve("v9")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("_SUCCESS"), Array[Byte]())

    // ---- run 2: new data + restart from the SAME checkpoint
    feed(2, Seq((2L, "c", 5.0), (4L, "a", 6.0)))
    val s2 = runOnce() // constructor repairs the orphan, then commits
    val fin = snap(s2)
    assert(fin == Set(
      Seq(1L, "b", 3.0, epoch(ts(0)), epoch(ts(1))), // run-1 state survives
      Seq(2L, "c", 5.0, epoch(ts(0)), epoch(ts(2))), // updated, loaded_at kept
      Seq(3L, "a", 4.0, epoch(ts(1)), epoch(ts(1))),
      Seq(4L, "a", 6.0, epoch(ts(2)), epoch(ts(2)))), // new key after restart
      s"unexpected final state: $fin")
    // restart processed ONLY the new file: exactly one commit past the
    // manual re-merge (v2) — batches 0/1 were not replayed into new versions
    assert(graft.ops.Storage.currentVersion(table).contains(3L))
  }

  private def epoch(t: java.sql.Timestamp): Long = t.getTime / 1000

  test("CDF view maintenance resumes from committed state after a restart") {
    import graft.ops.{MergeOps, Storage}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("cdf_maintain")
    val base = dir.resolve("t")
    val agg = dir.resolve("agg")
    def load(rows: Seq[(Long, String, Double)], ts: String) =
      MergeOps.prunedConditionalUpsert(base,
        rows.toDF("id", "grp", "x")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("id"), tracked = Seq("grp", "x"),
        runTs = lit(ts).cast("timestamp"), nParts = 4)
    def consumer(input: MemoryStream[Long]) =
      StreamingLoads.foreachBatchCdfAggMaintain(
        input.toDF().toDF("v"), base, agg,
        pk = Seq("id"), compareCols = Seq("grp", "x"), keys = Seq("grp"),
        sums = Map("sum_x" -> col("x").cast("decimal(38,6)")),
        trigger = Trigger.ProcessingTime(0)).start()

    // first consumer processes the bootstrap…
    val v0 = load(Seq((1L, "a", 1.0), (2L, "b", 2.0)), "2024-01-01 00:00:00")
    val in1 = MemoryStream[Long]
    in1.addData(v0)
    val q1 = consumer(in1)
    try q1.processAllAvailable() finally q1.stop()
    // …gets killed, and a FRESH query (new stream, same tables) takes
    // over for the remaining loads, resuming from the committed aggregate
    val v1 = load(Seq((1L, "a", 5.0), (3L, "b", 3.0)), "2024-01-02 00:00:00")
    val in2 = MemoryStream[Long]
    in2.addData(v1)
    val q2 = consumer(in2)
    try {
      val v2 = load(Seq((2L, "a", 2.5)), "2024-01-03 00:00:00") // b→a move
      in2.addData(v2); q2.processAllAvailable()
    } finally q2.stop()

    val got = Storage.readVersion(spark, agg)
      .select(col("grp"), col("count_rows"), col("sum_x").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    // final base state: 1→(a,5.0), 2→(a,2.5), 3→(b,3.0)
    assert(got == Seq(("a", 2L, 7.5), ("b", 1L, 3.0)), got.toString)
    // three versions consumed → three aggregate commits, none replayed
    assert(Storage.currentVersion(agg).contains(2L))

    // duplicate delivery (a foreachBatch retry re-sends versions 0..2):
    // the applied-version marker inside the aggregate commit skips them —
    // no new commit, no double-applied deltas
    val in3 = MemoryStream[Long]
    in3.addData(0L, 1L, 2L)
    val q3 = consumer(in3)
    try q3.processAllAvailable() finally q3.stop()
    assert(Storage.currentVersion(agg).contains(2L), "duplicates must not commit")
    val after = Storage.readVersion(spark, agg)
      .select(col("grp"), col("count_rows"), col("sum_x").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(after == got, "duplicates must not change the state")
  }

  test("streaming-maintained DISTRIBUTION view serves the percentile panel continuously") {
    // the (group, value) distribution view of mv11's batch path,
    // maintained from the commit-log tail: keys = (grp, x) and NO sum
    // partials — count_rows IS the per-value multiplicity. Deletes must
    // drive fully-retracted value rows to ZERO AND OUT of the state
    // (applyDelta's ghost filter), or the frequency percentile would
    // re-count values that left the base; the marker then makes the
    // registered rewrite navigate median/percentile the moment the tail
    // is drained, with no batch maintenance call anywhere.
    import graft.ops.{MatViews, MergeOps, Storage}
    import graft.plans.{MatView, MatViewRewrite}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("cdf_dist")
    val base = dir.resolve("t")
    val view = dir.resolve("dist")
    def load(rows: Seq[(Long, String, Double)], ts: String) =
      MergeOps.prunedConditionalUpsert(base,
        rows.toDF("id", "grp", "x")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("id"), tracked = Seq("grp", "x"),
        runTs = lit(ts).cast("timestamp"), nParts = 4)
    def consumer(input: MemoryStream[Long]) =
      StreamingLoads.foreachBatchCdfAggMaintain(
        input.toDF().toDF("v"), base, view,
        pk = Seq("id"), compareCols = Seq("grp", "x"),
        keys = Seq("grp", "x"), sums = Map.empty,
        trigger = Trigger.ProcessingTime(0)).start()

    // duplicated values within groups (multiplicity matters), then churn:
    // id 2 moves its value 2.0→9.0, ids 5/6 delete (the LAST copies of
    // 5.0 in a and 2.0 in b — those distribution rows must vanish)
    val v0 = load((1L to 6L).map(i =>
      (i, if (i % 2 == 0) "b" else "a",
        Seq(1.0, 2.0, 1.0, 2.0, 5.0, 2.0)(i.toInt - 1))), "2024-01-01 00:00:00")
    val v1 = load(Seq((2L, "b", 9.0)), "2024-01-02 00:00:00")
    val v2 = MergeOps.prunedDelete(base, Seq(5L, 6L).toDF("id"),
      pk = Seq("id"), nParts = 4)
    val in = MemoryStream[Long]
    in.addData(v0, v1, v2)
    // scheduled compaction unifies bucket owners (the rewrite's single-
    // owner scan shape); its version rides the same tail and advances the
    // marker through an EMPTY change feed
    Storage.compact(spark, base)
    in.addData(Storage.currentVersion(base).get)
    val q = consumer(in)
    try q.processAllAvailable() finally q.stop()

    // state: exactly the current base's (grp, x) multiplicities — and the
    // fully-retracted (a, 5.0) / (b, 2.0) rows are GONE, not zero-count
    val got = Storage.readVersion(spark, view)
      .select(col("grp"), col("x"), col("count_rows"))
      .as[(String, Double, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(("a", 1.0, 2L), ("b", 2.0, 1L), ("b", 9.0, 1L)),
      s"distribution state diverged: $got")

    // the percentile panel navigates off the STREAM-maintained state: the
    // marker the maintainer wrote is exactly registerRewrite's freshness
    MatViews.registerRewrite(spark, "dist_stream", base, view,
      keys = Seq("grp", "x"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MatViewRewrite
    try {
      def shape(df: org.apache.spark.sql.DataFrame) = df.groupBy("grp")
        .agg(median(col("x")).as("med"),
          percentile(col("x"), lit(0.75)).as("p75"),
          count(lit(1)).as("cnt"))
      val panel = shape(Storage.readPartitionedVersion(spark, base))
      val scans = panel.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
      assert(scans.exists(_.contains(view.toString)) &&
        !scans.exists(_.contains(base.toString)),
        s"the panel must navigate onto the stream-maintained view: $scans")
      val gotP = panel.orderBy("grp").collect().toSeq
      MatView.clear()
      val wantP = shape(Storage.readPartitionedVersion(spark, base))
        .orderBy("grp").collect().toSeq
      assert(gotP.toString == wantP.toString,
        s"navigated panel diverged:\n got  $gotP\n want $wantP")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq MatViewRewrite)
      MatView.clear()
    }
  }

  test("streaming-maintained statistical panel: variance and corr navigate off the commit-log tail") {
    // the stat-family partials are ALL plain signed sums, so the generic
    // CDF maintainer streams them with no new machinery: the sums map
    // carries the Σx/n/Σx² triple and the six pairwise cov terms as
    // expressions, and registerRewrite serves var_samp/stddev/corr off
    // the continuously-maintained state
    import graft.ops.{MatViews, MergeOps, Storage}
    import graft.plans.{MatView, MatViewRewrite}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("cdf_stats")
    val base = dir.resolve("t")
    val view = dir.resolve("stats")
    def load(rows: Seq[(Long, String, Option[Double], Option[Double])], ts: String) =
      MergeOps.prunedConditionalUpsert(base,
        rows.toDF("id", "grp", "x", "y")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("id"), tracked = Seq("grp", "x", "y"),
        runTs = lit(ts).cast("timestamp"), nParts = 4)
    val both = col("x").isNotNull && col("y").isNotNull
    def consumer(input: MemoryStream[Long]) =
      StreamingLoads.foreachBatchCdfAggMaintain(
        input.toDF().toDF("v"), base, view,
        pk = Seq("id"), compareCols = Seq("grp", "x", "y"), keys = Seq("grp"),
        sums = Map(
          "sum_x" -> col("x"),
          "cnt_x" -> when(col("x").isNotNull, 1L).otherwise(0L),
          "ssq_x" -> (col("x") * col("x")),
          "xy_n" -> when(both, 1L).otherwise(0L),
          "xy_sx" -> when(both, col("x")), "xy_sy" -> when(both, col("y")),
          "xy_sxx" -> when(both, col("x") * col("x")),
          "xy_syy" -> when(both, col("y") * col("y")),
          "xy_sxy" -> when(both, col("x") * col("y"))),
        trigger = Trigger.ProcessingTime(0)).start()

    val v0 = load((1L to 40L).map(i => (i, s"g${i % 2}",
      if (i % 5 == 0) None else Some(((i * 3) % 11).toDouble),
      if (i % 4 == 0) None else Some(((i * 3) % 11 + i % 3).toDouble))),
      "2024-01-01 00:00:00")
    val v1 = load(Seq((3L, "g1", Some(25.0), Some(26.0))), "2024-01-02 00:00:00")
    val v2 = MergeOps.prunedDelete(base, Seq(7L, 8L).toDF("id"),
      pk = Seq("id"), nParts = 4)
    val in = MemoryStream[Long]
    in.addData(v0, v1, v2)
    Storage.compact(spark, base)
    in.addData(Storage.currentVersion(base).get)
    val q = consumer(in)
    try q.processAllAvailable() finally q.stop()

    MatViews.registerRewrite(spark, "stats_stream", base, view,
      keys = Seq("grp"), sums = Map("x" -> "sum_x"),
      counts = Map("x" -> "cnt_x"), sumsqs = Map("x" -> "ssq_x"),
      covs = Map("xy" -> ("x", "y")))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MatViewRewrite
    try {
      def shape(df: org.apache.spark.sql.DataFrame) = df.groupBy("grp")
        .agg(var_samp(col("x")).as("vx"), stddev_pop(col("x")).as("sx"),
          corr(col("x"), col("y")).as("r"),
          covar_samp(col("x"), col("y")).as("cs"))
      val panel = shape(Storage.readPartitionedVersion(spark, base))
      val scans = panel.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
      }.flatten
      assert(scans.exists(_.contains(view.toString)) &&
        !scans.exists(_.contains(base.toString)),
        s"the stat panel must navigate onto the stream-maintained view: $scans")
      val got = panel.orderBy("grp").collect().toSeq
      MatView.clear()
      val want = shape(Storage.readPartitionedVersion(spark, base))
        .orderBy("grp").collect().toSeq
      assert(got.size == want.size && got.zip(want).forall { case (g, w) =>
        (0 until g.size).forall { j => (g.get(j), w.get(j)) match {
          case (p: Double, v: Double) => math.abs(p - v) <= 1e-9 * (1 + math.abs(v))
          case (p, v) => p == v
        } } }, s"streaming stat panel diverged:\n got  $got\n want $want")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq MatViewRewrite)
      MatView.clear()
    }
  }

  test("join-view maintenance resumes from the committed (vA, vB) marker; duplicates apply nothing") {
    import graft.ops.{MergeOps, Storage}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("join_view")
    val a = dir.resolve("dim")
    val b = dir.resolve("fact")
    val view = dir.resolve("view")
    def stamp(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    def loadA(rows: Seq[(Long, String)], ts: String) =
      MergeOps.prunedConditionalUpsert(a, stamp(rows.toDF("id", "grp")),
        pk = Seq("id"), tracked = Seq("grp"),
        runTs = lit(ts).cast("timestamp"), nParts = 4, keepVersions = 4)
    def loadB(rows: Seq[(Long, Long, Double)], ts: String) =
      MergeOps.prunedConditionalUpsert(b, stamp(rows.toDF("bid", "aid", "x")),
        pk = Seq("bid"), tracked = Seq("aid", "x"),
        runTs = lit(ts).cast("timestamp"), nParts = 4, keepVersions = 4)
    def consumer(input: MemoryStream[(String, Long)]) =
      StreamingLoads.foreachBatchJoinViewMaintain(
        input.toDF().toDF("tbl", "v"), a, b, view,
        pkA = Seq("id"), compareA = Seq("grp"),
        pkB = Seq("bid"), compareB = Seq("aid", "x"),
        joinKeysA = Seq("id"), joinKeysB = Seq("aid"),
        groupKeys = Seq("grp"),
        sums = Map("sum_x" -> col("x").cast("decimal(38,6)")),
        trigger = Trigger.ProcessingTime(0)).start()
    def state() = Storage.readVersion(spark, view)
      .select(col("grp"), col("count_rows"), col("sum_x").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq

    // consumer 1 bootstraps the joined view, then "crashes"
    val va0 = loadA(Seq(1L -> "g1", 2L -> "g2"), "2024-01-01 00:00:00")
    val vb0 = loadB(Seq((10L, 1L, 1.0), (11L, 2L, 2.0)), "2024-01-01 00:00:00")
    val in1 = MemoryStream[(String, Long)]
    in1.addData(("a", va0), ("b", vb0))
    val q1 = consumer(in1)
    try q1.processAllAvailable() finally q1.stop()
    assert(state() == Seq(("g1", 1L, 1.0), ("g2", 1L, 2.0)))

    // a FRESH query resumes from the marker and applies ONE mixed
    // two-sided interval: a group move on A plus a re-parent + value
    // change on B — the cross-term case the A₀/B₁ asymmetry exists for
    val va1 = loadA(Seq(1L -> "g2"), "2024-01-02 00:00:00")
    val vb1 = loadB(Seq((10L, 2L, 5.0)), "2024-01-02 00:00:00")
    val in2 = MemoryStream[(String, Long)]
    in2.addData(("a", va1), ("b", vb1))
    val q2 = consumer(in2)
    try q2.processAllAvailable() finally q2.stop()
    // recompute: b10⋈a2 (g2, 5.0), b11⋈a2 (g2, 2.0); g1 fully retracted
    assert(state() == Seq(("g2", 2L, 7.0)), state().toString)
    val vAfter = Storage.currentVersion(view)

    // duplicate redelivery of everything: the marker skips it — no new
    // commit, no double-applied delta
    val in3 = MemoryStream[(String, Long)]
    in3.addData(("a", va0), ("b", vb0), ("a", va1), ("b", vb1))
    val q3 = consumer(in3)
    try q3.processAllAvailable() finally q3.stop()
    assert(Storage.currentVersion(view) == vAfter, "duplicates must not commit")
    assert(state() == Seq(("g2", 2L, 7.0)))

    // the marker is MatViews' applied-bases format: the stream-maintained
    // view plugs straight into registerJoinRewrite freshness
    assert(graft.ops.MatViews.appliedBases(view).contains((va1, vb1)),
      "streaming marker must satisfy MatViews.appliedBases")
  }

  test("star-view maintenance: three sides roll from the marker; duplicates no-op; rewrite freshness holds") {
    import graft.ops.{MatViews, MergeOps, Storage}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("star_view_stream")
    val (a, b, f, view) = (dir.resolve("dim_a"), dir.resolve("dim_b"),
      dir.resolve("fact"), dir.resolve("view"))
    def stamp(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    def loadA(rows: Seq[(Long, String)]) =
      MergeOps.prunedConditionalUpsert(a, stamp(rows.toDF("a_id", "a_grp")),
        pk = Seq("a_id"), tracked = Seq("a_grp"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 4)
    def loadB(rows: Seq[(Long, String)]) =
      MergeOps.prunedConditionalUpsert(b, stamp(rows.toDF("b_id", "b_grp")),
        pk = Seq("b_id"), tracked = Seq("b_grp"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 4)
    def loadF(rows: Seq[(Long, Long, Long, Double)]) =
      MergeOps.prunedConditionalUpsert(f,
        stamp(rows.toDF("f_id", "f_aid", "f_bid", "f_val")
          .select(col("f_id"), col("f_aid"), col("f_bid"),
            col("f_val").cast("decimal(38,6)").as("f_val"))),
        pk = Seq("f_id"), tracked = Seq("f_aid", "f_bid", "f_val"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 4)
    val sides = Seq(MatViews.StarSide(f, Seq("f_id")),
      MatViews.StarSide(a, Seq("a_id")), MatViews.StarSide(b, Seq("b_id")))
    def consumer(input: MemoryStream[(String, Long)]) =
      StreamingLoads.foreachBatchStarViewMaintain(
        input.toDF().toDF("tbl", "v"), sides, view,
        joinKeys = Seq("f_aid" -> "a_id", "f_bid" -> "b_id"),
        keys = Seq("a_grp", "b_grp"),
        sums = Map("f_val" -> "sum_val"), counts = Map("f_val" -> "cnt_val"),
        keepVersions = 2, trigger = Trigger.ProcessingTime(0)).start()
    def state() = Storage.readVersion(spark, view)
      .select(col("a_grp"), col("b_grp"), col("count_rows"),
        col("sum_val").cast("double"))
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    def truth() = Storage.readPartitionedVersion(spark, f)
      .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
      .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
      .groupBy("a_grp", "b_grp")
      .agg(count(lit(1)).as("c"), sum("f_val").cast("double").as("s"))
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

    // bootstrap from the first delivery
    val va0 = loadA(Seq(1L -> "g1", 2L -> "g2"))
    val vb0 = loadB(Seq(1L -> "h1", 2L -> "h2"))
    val vf0 = loadF(Seq((10L, 1L, 1L, 1.0), (11L, 2L, 2L, 2.0), (12L, 1L, 2L, 4.0)))
    val in1 = MemoryStream[(String, Long)]
    in1.addData(("f", vf0), ("a", va0), ("b", vb0))
    val q1 = consumer(in1)
    try q1.processAllAvailable() finally q1.stop()
    assert(state() == truth(), s"bootstrap diverged: ${state()} vs ${truth()}")

    // a fresh query resumes from the marker and rolls ONE interval where
    // all THREE sides changed (dim moves + a fact re-parent)
    val va1 = loadA(Seq(1L -> "g2"))
    val vb1 = loadB(Seq(2L -> "h9"))
    val vf1 = loadF(Seq((10L, 2L, 1L, 7.0)))
    val in2 = MemoryStream[(String, Long)]
    in2.addData(("a", va1), ("b", vb1), ("f", vf1))
    val q2 = consumer(in2)
    try q2.processAllAvailable() finally q2.stop()
    assert(state() == truth(), s"3-side roll diverged: ${state()} vs ${truth()}")
    val vAfter = Storage.currentVersion(view)
    assert(MatViews.appliedVersions(view).contains(Seq(vf1, va1, vb1)),
      "streaming marker must satisfy MatViews.appliedVersions in side order")

    // duplicate redelivery of EVERYTHING: marker == current versions, so
    // maintainStar no-ops — no new commit, no double-applied delta
    val in3 = MemoryStream[(String, Long)]
    in3.addData(("f", vf0), ("a", va0), ("b", vb0), ("a", va1), ("b", vb1), ("f", vf1))
    val q3 = consumer(in3)
    try q3.processAllAvailable() finally q3.stop()
    assert(Storage.currentVersion(view) == vAfter, "duplicates must not commit")
    assert(state() == truth())
    Storage.deleteRecursively(dir)
  }

  test("join-view maintenance: a first delivery naming only ONE side bootstraps the other at its current version") {
    import graft.ops.{MergeOps, Storage}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("join_view_oneside")
    val a = dir.resolve("dim")
    val b = dir.resolve("fact")
    val view = dir.resolve("view")
    def stamp(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    val va0 = MergeOps.prunedConditionalUpsert(a,
      stamp(Seq(1L -> "g1", 2L -> "g2").toDF("id", "grp")),
      pk = Seq("id"), tracked = Seq("grp"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4, keepVersions = 4)
    MergeOps.prunedConditionalUpsert(b,
      stamp(Seq((10L, 1L, 1.0), (11L, 2L, 2.0)).toDF("bid", "aid", "x")),
      pk = Seq("bid"), tracked = Seq("aid", "x"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4, keepVersions = 4)
    // only A's commit event arrives — B's side must fall back to its
    // current committed version instead of failing on an empty max
    val in = MemoryStream[(String, Long)]
    in.addData(("a", va0))
    val q = StreamingLoads.foreachBatchJoinViewMaintain(
      in.toDF().toDF("tbl", "v"), a, b, view,
      pkA = Seq("id"), compareA = Seq("grp"),
      pkB = Seq("bid"), compareB = Seq("aid", "x"),
      joinKeysA = Seq("id"), joinKeysB = Seq("aid"),
      groupKeys = Seq("grp"),
      sums = Map("sum_x" -> col("x").cast("decimal(38,6)")),
      trigger = Trigger.ProcessingTime(0)).start()
    try q.processAllAvailable() finally q.stop()
    val got = Storage.readVersion(spark, view)
      .select(col("grp"), col("count_rows"), col("sum_x").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("g1", 1L, 1.0), ("g2", 1L, 2.0)), got.toString)
  }

  test("join-view maintenance fails loudly on a non-manifested base instead of no-opping forever") {
    import graft.ops.Storage
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("join_view_plain")
    val a = dir.resolve("dim")
    val b = dir.resolve("fact")
    // WRONG layout: plain commitVersion tables have no partition manifests,
    // so no change feed exists to maintain from
    Storage.commitVersion(Seq(1L -> "g1").toDF("id", "grp"), a)
    Storage.commitVersion(Seq((10L, 1L, 1.0)).toDF("bid", "aid", "x"), b)
    val in = MemoryStream[(String, Long)]
    in.addData(("a", 0L), ("b", 0L))
    val q = StreamingLoads.foreachBatchJoinViewMaintain(
      in.toDF().toDF("tbl", "v"), a, b, dir.resolve("view"),
      pkA = Seq("id"), compareA = Seq("grp"),
      pkB = Seq("bid"), compareB = Seq("aid", "x"),
      joinKeysA = Seq("id"), joinKeysB = Seq("aid"),
      groupKeys = Seq("grp"),
      sums = Map("sum_x" -> col("x").cast("decimal(38,6)")),
      trigger = Trigger.ProcessingTime(0)).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("not partition-manifested"))),
      s"expected the loud layout diagnosis, got: $e")
  }

  test("join-view maintenance self-heals when the consumer lags past a base's retention") {
    import graft.ops.{MergeOps, Storage}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("join_view_lag")
    val a = dir.resolve("dim")
    val b = dir.resolve("fact")
    val view = dir.resolve("view")
    def stamp(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    // B's loads rewrite EVERY row (full churn) at keepVersions=1, so old
    // manifests vacuum as fast as the producer commits
    def loadB(mult: Double, ts: String) =
      MergeOps.prunedConditionalUpsert(b,
        stamp((1L to 6L).map(i => (i, i % 2 + 1, i * mult)).toDF("bid", "aid", "x")),
        pk = Seq("bid"), tracked = Seq("aid", "x"),
        runTs = lit(ts).cast("timestamp"), nParts = 4)
    def consumer(input: MemoryStream[(String, Long)]) =
      StreamingLoads.foreachBatchJoinViewMaintain(
        input.toDF().toDF("tbl", "v"), a, b, view,
        pkA = Seq("id"), compareA = Seq("grp"),
        pkB = Seq("bid"), compareB = Seq("aid", "x"),
        joinKeysA = Seq("id"), joinKeysB = Seq("aid"),
        groupKeys = Seq("grp"),
        sums = Map("sum_x" -> col("x").cast("decimal(38,6)")),
        trigger = Trigger.ProcessingTime(0)).start()

    val va0 = MergeOps.prunedConditionalUpsert(a,
      stamp(Seq(1L -> "g1", 2L -> "g2").toDF("id", "grp")),
      pk = Seq("id"), tracked = Seq("grp"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4, keepVersions = 4)
    val vb0 = loadB(1.0, "2024-01-01 00:00:00")
    val in1 = MemoryStream[(String, Long)]
    in1.addData(("a", va0), ("b", vb0))
    val q1 = consumer(in1)
    try q1.processAllAvailable() finally q1.stop()

    // consumer sleeps while B churns three full rewrites — vb0's manifest
    // is vacuumed out from under the applied marker
    loadB(2.0, "2024-01-02 00:00:00")
    loadB(3.0, "2024-01-03 00:00:00")
    val vb3 = loadB(4.0, "2024-01-04 00:00:00")
    assert(!Storage.partitionManifestRetained(b, vb0), "fixture: vb0 must be swept")

    // the woken consumer cannot diff b against vb0 — it re-bootstraps
    val in2 = MemoryStream[(String, Long)]
    in2.addData(("b", vb3))
    val q2 = consumer(in2)
    try q2.processAllAvailable() finally q2.stop()
    val got = Storage.readVersion(spark, view)
      .select(col("grp"), col("count_rows"), col("sum_x").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    // recompute at x = i*4: aid = i%2+1 → g1 gets even i (2,4,6), g2 odd (1,3,5)
    assert(got == Seq(("g1", 3L, 4.0 * (2 + 4 + 6)), ("g2", 3L, 4.0 * (1 + 3 + 5))),
      got.toString)
  }

  test("CDF view maintenance self-heals when the consumer lags past base retention") {
    import graft.ops.{MergeOps, Storage}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = Files.createTempDirectory("cdf_lag")
    val base = dir.resolve("t")
    val agg = dir.resolve("agg")
    // every load rewrites EVERY row → all buckets churn each commit, so
    // old versions become unreferenced and vacuum (keepVersions=1) sweeps
    // them as fast as the producer commits
    def load(mult: Double, ts: String) =
      MergeOps.prunedConditionalUpsert(base,
        (1L to 8L).map(i => (i, s"g${i % 2}", i * mult)).toDF("id", "grp", "x")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("id"), tracked = Seq("grp", "x"),
        runTs = lit(ts).cast("timestamp"), nParts = 4)
    def consumer(input: MemoryStream[Long]) =
      StreamingLoads.foreachBatchCdfAggMaintain(
        input.toDF().toDF("v"), base, agg,
        pk = Seq("id"), compareCols = Seq("grp", "x"), keys = Seq("grp"),
        sums = Map("sum_x" -> col("x").cast("decimal(38,6)")),
        trigger = Trigger.ProcessingTime(0)).start()

    // consumer applies the bootstrap, then falls asleep…
    val v0 = load(1.0, "2024-01-01 00:00:00")
    val in1 = MemoryStream[Long]; in1.addData(v0)
    val q1 = consumer(in1)
    try q1.processAllAvailable() finally q1.stop()
    // …while the producer commits three full-churn loads; v0's manifest
    // is vacuumed out from under the last-applied marker
    load(2.0, "2024-01-02 00:00:00")
    load(3.0, "2024-01-03 00:00:00")
    val v3 = load(4.0, "2024-01-04 00:00:00")
    assert(!Storage.partitionManifestRetained(base, v0), "fixture: v0 must be swept")

    // the woken consumer cannot diff against v0 — it re-bootstraps at v3
    val in2 = MemoryStream[Long]; in2.addData(v3)
    val q2 = consumer(in2)
    try q2.processAllAvailable() finally q2.stop()
    val got = Storage.readVersion(spark, agg)
      .select(col("grp"), col("count_rows"), col("sum_x").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    // recompute of the final state: odd ids → g1, even → g0, x = i*4
    assert(got == Seq(("g0", 4L, 4.0 * (2 + 4 + 6 + 8)), ("g1", 4L, 4.0 * (1 + 3 + 5 + 7))),
      got.toString)
  }

  test("foreachBatch streaming upsert lands the latest value per key") {
    val stateSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("loaded_at", TimestampType), StructField("last_upd_at", TimestampType)))
    val stateDir = Files.createTempDirectory("stream_state")
    val state = new StreamingLoads.StreamingTableState(spark, stateSchema, stateDir)

    val stream = eventsStream(eventsStreamDir)
      .select(col("user_id"), col("event_type"), col("value"),
        lit(null).cast("timestamp").as("loaded_at"),
        lit(null).cast("timestamp").as("last_upd_at"))
    val q = StreamingLoads.foreachBatchUpsert(stream, state,
      Seq("user_id"), Seq("event_type", "value"),
      bid => java.sql.Timestamp.valueOf("2024-02-01 00:00:00")).start()
    try q.processAllAvailable() finally q.stop()

    val snap = state.snapshot
    // one row per user, all 15 sf0.001 users present
    assert(snap.count() == 15)
    assert(snap.groupBy("user_id").count().filter(col("count") =!= 1).count() == 0)
  }
}

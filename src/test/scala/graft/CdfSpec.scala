package graft

import java.nio.file.Files

import graft.ops.{Cdc, MergeOps, Storage}
import org.apache.spark.sql.functions._

/** Change-data-feed GENERATION between two committed versions of a
  * partition-manifested table (`Cdc.changeDataFeed`): row-level equivalence
  * to the naive full-snapshot diff, the manifest-diff pruning that makes it
  * O(changed buckets), and the delete branch the upsert-driven oracle row
  * (m8) can't reach.
  */
class CdfSpec extends SparkTestBase {
  import spark.implicits._

  private val NParts = 8

  private def load(table: java.nio.file.Path, rows: Seq[(Int, String, Double)], ts: String): Long =
    MergeOps.prunedConditionalUpsert(table,
      rows.toDF("id", "name", "score")
        .withColumn("loaded_at", lit(null).cast("timestamp"))
        .withColumn("last_upd_at", lit(null).cast("timestamp")),
      pk = Seq("id"), tracked = Seq("name", "score"),
      runTs = lit(ts).cast("timestamp"), nParts = NParts)

  private def feed(table: java.nio.file.Path, fromV: Long, toV: Long) =
    Cdc.changeDataFeed(spark, table, fromV, toV,
        pk = Seq("id"), compareCols = Seq("name", "score"))
      .select("id", "name", "score", "change_type").as[(Int, String, Double, String)]
      .collect().sortBy(_._1).toSeq

  test("CDF equals the naive full-snapshot diff; only changed buckets are scanned") {
    val dir = Files.createTempDirectory("cdf_equiv")
    val table = dir.resolve("t")
    try {
      val base = (1 to 200).map(i => (i, s"n$i", i.toDouble))
      val v0 = load(table, base, "2024-01-01 00:00:00")
      // one update + one insert → at most 2 of 8 buckets rewritten
      val v1 = load(table, Seq((7, "n7-upd", 7.0), (201, "n201", 201.0)),
        "2024-01-02 00:00:00")

      assert(feed(table, v0, v1) == Seq(
        (7, "n7-upd", 7.0, "update"), (201, "n201", 201.0, "insert")))

      // the pruning is real AND exact: the manifest diff names at most the
      // incoming keys' buckets, and strictly fewer than the table has
      val changed = Storage.partitionsChangedBetween(table, v0, v1)
      val all = Storage.committedPartitions(table)
      assert(changed.subsetOf(all) && changed.size <= 2 && all.size == NParts,
        s"changed=$changed all=$all")

      // equivalence with the unpruned diff: same join over FULL snapshots
      val o = Storage.readPartitionedVersionAt(spark, table, v0)
        .select("id", "name", "score").withColumn("p", lit(true)).alias("o")
      val n = Storage.readPartitionedVersionAt(spark, table, v1)
        .select("id", "name", "score").withColumn("p", lit(true)).alias("n")
      val naive = o.join(n, col("o.id") <=> col("n.id"), "full_outer")
        .filter(col("o.p").isNull || col("n.p").isNull ||
          col("o.name") =!= col("n.name") || col("o.score") =!= col("n.score"))
        .count()
      assert(naive == 2)
    } finally Storage.deleteRecursively(dir)
  }

  test("idempotent re-delivery: no buckets change and the feed is empty") {
    val dir = Files.createTempDirectory("cdf_noop")
    val table = dir.resolve("t")
    try {
      val rows = (1 to 50).map(i => (i, s"n$i", i.toDouble))
      val v0 = load(table, rows, "2024-01-01 00:00:00")
      val v1 = load(table, rows, "2024-01-02 00:00:00") // same payload again
      assert(Storage.partitionsChangedBetween(table, v0, v1).isEmpty)
      assert(feed(table, v0, v1).isEmpty)
    } finally Storage.deleteRecursively(dir)
  }

  test("deletes surface with the fromV image; multi-commit ranges compose") {
    val dir = Files.createTempDirectory("cdf_delete")
    val table = dir.resolve("t")
    try {
      val v0 = load(table, (1 to 40).map(i => (i, s"n$i", i.toDouble)),
        "2024-01-01 00:00:00")
      val st = Storage.readPartitionedVersion(spark, table)
      // delete one row of a MULTI-row bucket by rewriting the bucket
      // without it (the pruned-delete shape: other buckets carry)
      val (bkt, victim) = st.groupBy("pbucket")
        .agg(min(col("id")).as("victim"), count(lit(1)).as("c"))
        .filter(col("c") >= 2).orderBy("pbucket")
        .select(col("pbucket"), col("victim")).as[(Int, Int)].head()
      val v1 = Storage.commitPartitions(
        st.filter(col("pbucket") === bkt && col("id") =!= victim),
        table, "pbucket")
      assert(feed(table, v0, v1) ==
        Seq((victim, s"n$victim", victim.toDouble, "delete")))

      // then update a different key in a separate commit: the v0→v2 feed
      // composes both commits' effects through one manifest diff
      val updKey = if (victim == 1) 2 else 1
      val v2 = load(table, Seq((updKey, "upd", 0.5)), "2024-01-02 00:00:00")
      assert(feed(table, v0, v2) == Seq(
        (updKey, "upd", 0.5, "update"),
        (victim, s"n$victim", victim.toDouble, "delete")).sortBy(_._1))
    } finally Storage.deleteRecursively(dir)
  }

  test("emptying a whole bucket needs an explicit drop, and feeds as deletes") {
    val dir = Files.createTempDirectory("cdf_drop")
    val table = dir.resolve("t")
    try {
      val v0 = load(table, (1 to 40).map(i => (i, s"n$i", i.toDouble)),
        "2024-01-01 00:00:00")
      val st = Storage.readPartitionedVersion(spark, table)
      val bkt = st.select(min(col("pbucket"))).as[Int].head()
      val doomed = st.filter(col("pbucket") === bkt)
        .select(col("id"), col("name"), col("score")).as[(Int, String, Double)]
        .collect().sortBy(_._1).toSeq
      assert(doomed.nonEmpty)
      // an EMPTY rewrite writes no partition dir — without the explicit
      // drop the manifest would silently carry the old bytes forward
      val v1 = Storage.commitPartitions(st.limit(0), table, "pbucket",
        dropParts = Set(s"pbucket=$bkt"))
      assert(!Storage.committedPartitions(table).contains(s"pbucket=$bkt"))
      assert(Storage.readPartitionedVersion(spark, table)
        .filter(col("pbucket") === bkt).count() == 0)
      assert(feed(table, v0, v1) == doomed.map { case (i, n, s0) => (i, n, s0, "delete") })
      // contradictory request: dropping a partition `next` also rewrites
      intercept[IllegalArgumentException] {
        Storage.commitPartitions(
          st.filter(col("pbucket") =!= bkt), table, "pbucket",
          dropParts = Storage.committedPartitions(table).take(1))
      }
    } finally Storage.deleteRecursively(dir)
  }

  test("preimages: updates emit retract+add pairs; applyDelta ≡ recompute") {
    val dir = Files.createTempDirectory("cdf_pre")
    val table = dir.resolve("t")
    try {
      val v0 = load(table, Seq((1, "a", 1.0), (2, "b", 2.0)), "2024-01-01 00:00:00")
      val v1 = load(table, Seq((1, "a2", 5.0), (3, "c", 3.0)), "2024-01-02 00:00:00")
      val pre = Cdc.changeDataFeed(spark, table, v0, v1,
          pk = Seq("id"), compareCols = Seq("name", "score"), preImages = true)
        .as[(Int, String, Double, String)].collect().sortBy(r => (r._1, r._4)).toSeq
      assert(pre == Seq( // "update_postimage" sorts before "update_preimage"
        (1, "a2", 5.0, "update_postimage"), (1, "a", 1.0, "update_preimage"),
        (3, "c", 3.0, "insert")))

      // the feed maintains an additive aggregate exactly: retract the
      // preimage, add the postimage, compare against a full recompute
      def aggOf(v: Long) = Storage.readPartitionedVersionAt(spark, table, v)
        .groupBy(col("name").substr(1, 1).as("g"))
        .agg(count(lit(1)).as("count_rows"),
          sum(col("score").cast("decimal(38,6)")).as("sum_score"))
      val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L)
      val delta = Cdc.changeDataFeed(spark, table, v0, v1,
          pk = Seq("id"), compareCols = Seq("name", "score"), preImages = true)
        .groupBy(col("name").substr(1, 1).as("g"))
        .agg(sum(sign).as("count_rows"),
          sum(sign * col("score").cast("decimal(38,6)")).as("sum_score"))
      val maintained = graft.ops.AggMaintain
        .applyDelta(aggOf(v0), delta, keys = Seq("g"), sumCols = Seq("sum_score"))
        .as[(String, Long, java.math.BigDecimal)].collect().sortBy(_._1).toSeq
      val recomputed = aggOf(v1)
        .as[(String, Long, java.math.BigDecimal)].collect().sortBy(_._1).toSeq
      assert(maintained == recomputed)
    } finally Storage.deleteRecursively(dir)
  }

  test("vacuum keeps versions referenced by ANY retained manifest") {
    // v1 rewrites ONE bucket; v2 rewrites every other bucket. The new
    // (v2) manifest then references only {v1, v2} — but v1 is retained
    // (keepVersions=1) and ITS manifest still maps the late-rewritten
    // buckets to v0, so v0's bytes must survive v2's vacuum or both
    // readPartitionedVersionAt(v1) and the routine feed(v1, v2) crash.
    val dir = Files.createTempDirectory("cdf_vacuum")
    val table = dir.resolve("t")
    try {
      val base = (1 to 200).map(i => (i, s"n$i", i.toDouble))
      val v0 = load(table, base, "2024-01-01 00:00:00")
      assert(Storage.committedPartitions(table).size == NParts)
      val bucketOf = Storage.readPartitionedVersion(spark, table)
        .select(col("id"), col("pbucket")).as[(Int, Int)].collect().toMap
      val x = bucketOf(1)
      val v1 = load(table, Seq((1, "x", 9.9)), "2024-01-02 00:00:00")
      val others = base.filter { case (i, _, _) => bucketOf(i) != x }
        .map { case (i, n, s0) => (i, n + "-v2", s0) }
      val v2 = load(table, others, "2024-01-03 00:00:00")

      assert(Files.exists(table.resolve("v0")), "v0 carried buckets for retained v1")
      val asOfV1 = Storage.readPartitionedVersionAt(spark, table, v1)
      assert(asOfV1.count() == 200)
      assert(asOfV1.filter(col("name").endsWith("-v2")).count() == 0)
      assert(feed(table, v1, v2).size == others.size)
    } finally Storage.deleteRecursively(dir)
  }

  test("prunedDelete: only losing buckets rewrite; emptied buckets drop; absent keys no-op") {
    val dir = Files.createTempDirectory("cdf_pdelete")
    val table = dir.resolve("t")
    try {
      val base = (1 to 40).map(i => (i, s"n$i", i.toDouble))
      val v0 = load(table, base, "2024-01-01 00:00:00")
      val st = Storage.readPartitionedVersion(spark, table)
      val bucketOf = st.select(col("id"), col("pbucket")).as[(Int, Int)]
        .collect().toMap
      // victims: ONE row of a multi-row bucket + EVERY row of another
      val multi = bucketOf.groupBy(_._2).filter(_._2.size >= 2)
      val b1 = multi.keys.min
      val partial = multi(b1).keys.min
      val b2 = bucketOf.values.toSet.filter(_ != b1).min
      val wiped = bucketOf.filter(_._2 == b2).keys.toSeq.sorted
      val victims = (partial +: wiped).toDF("id")

      val v1 = MergeOps.prunedDelete(table, victims, pk = Seq("id"), nParts = NParts)
      val after = Storage.readPartitionedVersion(spark, table)
        .select(col("id")).as[Int].collect().sorted.toSeq
      assert(after == (1 to 40).filterNot((partial +: wiped).contains(_)))
      // exactly the two losing buckets changed; the wiped one is GONE
      assert(Storage.partitionsChangedBetween(table, v0, v1) ==
        Set(s"pbucket=$b1", s"pbucket=$b2"))
      assert(!Storage.committedPartitions(table).contains(s"pbucket=$b2"))
      // downstream consumers see the removals as ordinary feed deletes
      assert(feed(table, v0, v1).map(r => (r._1, r._4)) ==
        (partial +: wiped).sorted.map(i => (i, "delete")))

      // deleting absent keys rewrites ZERO buckets (idempotent re-delivery)
      val v2 = MergeOps.prunedDelete(table, victims, pk = Seq("id"), nParts = NParts)
      assert(Storage.partitionsChangedBetween(table, v1, v2).isEmpty)
      // a never-committed table is the documented -1 no-op, not a crash
      assert(MergeOps.prunedDelete(dir.resolve("nope"), victims, Seq("id"), NParts) == -1L)
    } finally Storage.deleteRecursively(dir)
  }

  test("compaction is invisible to the feed: rewritten bytes, unchanged state") {
    val dir = Files.createTempDirectory("cdf_compact")
    val table = dir.resolve("t")
    try {
      val base = (1 to 120).map(i => (i, s"n$i", i.toDouble))
      load(table, base, "2024-01-01 00:00:00")
      load(table, Seq((3, "upd", 0.5)), "2024-01-02 00:00:00")
      val vPre = Storage.currentVersion(table).get
      Storage.compact(spark, table, targetBytes = 1L << 30)
      val vPost = Storage.currentVersion(table).get
      assert(vPost == vPre + 1)
      // every bucket's bytes moved, but the commit carries the
      // state-identical marker: the diff is METADATA-ONLY empty — at
      // 100 TB this is what keeps scheduled compaction from turning the
      // next view refresh into a full-table scan-and-compare
      assert(Storage.partitionsChangedBetween(table, vPre, vPost).isEmpty)
      assert(feed(table, vPre, vPost).isEmpty)
      // an interval ENDING at the compaction resolves through the marker
      // to the pre-compaction version: only the data commits' buckets
      // diff, even though every owner moved at vPost
      val first = vPre - 1 // the bootstrap load
      assert(Storage.partitionsChangedBetween(table, first, vPost) ==
        Storage.partitionsChangedBetween(table, first, vPre))
      assert(Storage.partitionsChangedBetween(table, first, vPre).nonEmpty)
    } finally Storage.deleteRecursively(dir)
  }

  test("an interval CROSSING a compaction composes per-step: only the real commits' buckets diff") {
    val dir = Files.createTempDirectory("cdf_cross")
    val table = dir.resolve("t")
    def loadK(rows: Seq[(Int, String, Double)], ts: String): Long =
      MergeOps.prunedConditionalUpsert(table,
        rows.toDF("id", "name", "score")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("id"), tracked = Seq("name", "score"),
        runTs = lit(ts).cast("timestamp"), nParts = NParts, keepVersions = 20)
    try {
      val v0 = loadK((1 to 120).map(i => (i, s"n$i", i.toDouble)), "2024-01-01 00:00:00")
      val v1 = loadK(Seq((3, "upd3", 0.5)), "2024-01-02 00:00:00")
      Storage.compact(spark, table, targetBytes = 1L << 30)
      val vC = Storage.currentVersion(table).get
      val v2 = loadK(Seq((5, "upd5", 1.5), (121, "n121", 121.0)), "2024-01-03 00:00:00")
      // the compaction moved EVERY bucket's owner: an endpoint manifest
      // diff over the crossing interval v0→v2 would report the whole table
      val m0 = Storage.readPartsManifest(table.resolve(s"v$v0"))
      val m2 = Storage.readPartsManifest(table.resolve(s"v$v2"))
      assert(m0.keySet.forall(p => m0.get(p) != m2.get(p)),
        "fixture must make the endpoint diff degenerate to all buckets")
      // per-step composition skips the marker step: the crossing interval
      // touches only the buckets the two REAL commits changed
      val crossing = Storage.partitionsChangedBetween(table, v0, v2)
      val perCommit = Storage.partitionsChangedBetween(table, v0, v1) ++
        Storage.partitionsChangedBetween(table, vC, v2)
      assert(crossing == perCommit, s"crossing=$crossing perCommit=$perCommit")
      assert(crossing.size <= 3 && m0.size == NParts,
        s"expected a sliver of the $NParts buckets, got $crossing")
      // and the feed over the crossing interval is byte-identical to the
      // full-diff answer (the same rows the naive snapshot diff yields)
      assert(feed(table, v0, v2) == Seq(
        (3, "upd3", 0.5, "update"), (5, "upd5", 1.5, "update"),
        (121, "n121", 121.0, "insert")))
      // a lagging-view shape: interval starting BEFORE the bootstrap's
      // successor and ending past the compaction still composes
      assert(feed(table, v1, v2) == Seq(
        (5, "upd5", 1.5, "update"), (121, "n121", 121.0, "insert")))
    } finally Storage.deleteRecursively(dir)
  }

  test("DV-compaction is marked state-identical; crossing feeds stay pruned and exact") {
    val dir = Files.createTempDirectory("cdf_dvcross")
    val table = dir.resolve("t")
    def loadK(rows: Seq[(Int, String, Double)], ts: String): Long =
      MergeOps.prunedConditionalUpsert(table,
        rows.toDF("id", "name", "score")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("id"), tracked = Seq("name", "score"),
        runTs = lit(ts).cast("timestamp"), nParts = NParts, keepVersions = 20)
    try {
      val v0 = loadK((1 to 120).map(i => (i, s"n$i", i.toDouble)), "2024-01-01 00:00:00")
      // DV takedown (metadata-only), then materialize it (rewrites only
      // the tombstoned buckets, marked state-identical), then a real load
      val vD = MergeOps.deleteWithVectors(table,
        Seq(11, 12).toDF("id"), pk = Seq("id"), nParts = NParts, keepVersions = 20)
      val vM = MergeOps.compactDeletionVectors(spark, table, keepVersions = 20)
      assert(vM == vD + 1)
      // the materialization is invisible to the feed on its own...
      assert(Storage.partitionsChangedBetween(table, vD, vM).isEmpty)
      assert(Storage.dvChangedBuckets(table, vD, vM).isEmpty)
      assert(feed(table, vD, vM).isEmpty)
      val v2 = loadK(Seq((20, "upd20", 2.5)), "2024-01-03 00:00:00")
      // ...and an interval crossing it unions the DV'd buckets (from the
      // takedown step) with the load's buckets — never the whole table
      val crossing = Storage.partitionsChangedBetween(table, v0, v2) ++
        Storage.dvChangedBuckets(table, v0, v2)
      assert(crossing.size <= 3, s"expected at most 3 buckets, got $crossing")
      assert(feed(table, v0, v2) == Seq(
        (11, "n11", 11.0, "delete"), (12, "n12", 12.0, "delete"),
        (20, "upd20", 2.5, "update")))
    } finally Storage.deleteRecursively(dir)
  }

  test("randomized: feed(vi, vj) ≡ the naive snapshot diff for EVERY version pair") {
    val dir = Files.createTempDirectory("cdf_random")
    val table = dir.resolve("t")
    try {
      val rnd = new scala.util.Random(7) // fixed seed: deterministic replay
      val Keep = 20 // retain every version so all pairs stay feedable
      def randomRows(ids: Seq[Int]) =
        ids.map(i => (i, s"n${rnd.nextInt(5)}", rnd.nextInt(10).toDouble))
      var versions = Vector(load(table, randomRows(1 to 30), "2024-01-01 00:00:00"))
      // interleave random upserts and deletes (the load helper uses
      // keepVersions=1, so re-commit through the APIs directly here)
      for (step <- 1 to 7) {
        val ids = rnd.shuffle((1 to 34).toList).take(rnd.nextInt(8) + 1)
        val v =
          if (step % 3 == 0)
            MergeOps.prunedDelete(table, ids.toDF("id"), pk = Seq("id"),
              nParts = NParts, keepVersions = Keep)
          else
            MergeOps.prunedConditionalUpsert(table,
              randomRows(ids).toDF("id", "name", "score")
                .withColumn("loaded_at", lit(null).cast("timestamp"))
                .withColumn("last_upd_at", lit(null).cast("timestamp")),
              pk = Seq("id"), tracked = Seq("name", "score"),
              runTs = lit(s"2024-01-0${step + 1} 00:00:00").cast("timestamp"),
              nParts = NParts, keepVersions = Keep)
        versions :+= v
      }
      val snaps = versions.map { v =>
        v -> Storage.readPartitionedVersionAt(spark, table, v)
          .select(col("id"), col("name"), col("score"))
          .as[(Int, String, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      }.toMap
      for (i <- versions; j <- versions if i < j) {
        val (a, b) = (snaps(i), snaps(j))
        val expected =
          b.filterNot { case (k, _) => a.contains(k) }
            .map { case (k, (n, s0)) => (k, n, s0, "insert") } ++
          a.filterNot { case (k, _) => b.contains(k) }
            .map { case (k, (n, s0)) => (k, n, s0, "delete") } ++
          b.collect { case (k, (n, s0)) if a.get(k).exists(_ != (n, s0)) =>
            (k, n, s0, "update") }
        assert(feed(table, i, j).toSet == expected.toSet, s"pair ($i, $j)")
      }
    } finally Storage.deleteRecursively(dir)
  }

  test("retention is a table property: default-keep commits cannot sweep the feed tail") {
    val dir = Files.createTempDirectory("cdf_retention")
    val table = dir.resolve("t")
    try {
      def churn(mult: Double, ts: String, keep: Int = 1) =
        MergeOps.prunedConditionalUpsert(table,
          (1 to 24).map(i => (i, s"n$i", i * mult)).toDF("id", "name", "score")
            .withColumn("loaded_at", lit(null).cast("timestamp"))
            .withColumn("last_upd_at", lit(null).cast("timestamp")),
          pk = Seq("id"), tracked = Seq("name", "score"),
          runTs = lit(ts).cast("timestamp"), nParts = NParts,
          keepVersions = keep)
      // ONE writer declares the feed tail (ratchets the table property)…
      val v0 = churn(1.0, "2024-01-01 00:00:00", keep = 3)
      assert(Storage.tableRetention(table) == 3)
      // …then every other commit uses the DEFAULT keep: each churns every
      // bucket, so under per-commit retention v0 would be swept by v2
      val v3 = Seq(2.0, 3.0, 4.0)
        .zipWithIndex.map { case (m, i) => churn(m, s"2024-01-0${i + 2} 00:00:00") }.last
      assert(Storage.partitionManifestRetained(table, v0),
        "the table-level window must protect v0 from default-keep commits")
      assert(feed(table, v0, v3).size == 24)

      // beyond the declared window the tail DOES age out, as contracted
      churn(5.0, "2024-01-05 00:00:00")
      val v5 = churn(6.0, "2024-01-06 00:00:00")
      assert(!Storage.partitionManifestRetained(table, v0))
      intercept[IllegalArgumentException] { feed(table, v0, v5) }
      assert(feed(table, v3 - 1, v5).size == 24) // in-window bases still serve
      // a commit declaring LESS cannot regress the mark (monotone ratchet)
      churn(7.0, "2024-01-07 00:00:00", keep = 2)
      assert(Storage.tableRetention(table) == 3)
    } finally Storage.deleteRecursively(dir)
  }

  test("purgeHistory: after a takedown no retained version serves the deleted rows") {
    val dir = Files.createTempDirectory("cdf_purge")
    val table = dir.resolve("t")
    try {
      val v0 = MergeOps.prunedConditionalUpsert(table,
        (1 to 20).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "score")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("id"), tracked = Seq("name", "score"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = NParts,
        keepVersions = 4)
      val v1 = MergeOps.prunedDelete(table, Seq(3, 7).toDF("id"),
        pk = Seq("id"), nParts = NParts)
      // the delete alone is NOT a takedown: the retained bootstrap still
      // serves the doomed rows through time travel
      assert(Storage.readPartitionedVersionAt(spark, table, v0)
        .filter(col("id").isin(3, 7)).count() == 2)

      Storage.purgeHistory(spark, table)
      // history gone: pre-purge versions unreadable, bytes swept
      assert(!Storage.partitionManifestRetained(table, v0))
      assert(!Files.exists(table.resolve(s"v$v0")) && !Files.exists(table.resolve(s"v$v1")))
      intercept[IllegalArgumentException] {
        Storage.readPartitionedVersionAt(spark, table, v1)
      }
      // the current state survives intact, minus the doomed rows
      val now = Storage.readPartitionedVersion(spark, table)
        .select(col("id")).as[Int].collect().sorted.toSeq
      assert(now == (1 to 20).filterNot(Set(3, 7)))
      assert(Storage.tableRetention(table) == 1)
    } finally Storage.deleteRecursively(dir)
  }

  test("time travel: the state AS OF an old version reads exactly") {
    val dir = Files.createTempDirectory("cdf_tt")
    val table = dir.resolve("t")
    try {
      val base = (1 to 40).map(i => (i, s"n$i", i.toDouble))
      val v0 = load(table, base, "2024-01-01 00:00:00")
      load(table, Seq((5, "changed", 0.0), (99, "new", 9.0)), "2024-01-02 00:00:00")
      val asOf = Storage.readPartitionedVersionAt(spark, table, v0)
        .select("id", "name", "score").as[(Int, String, Double)]
        .collect().sortBy(_._1).toSeq
      assert(asOf == base)
      // a version that was never committed is refused
      intercept[IllegalArgumentException] {
        Storage.readPartitionedVersionAt(spark, table, 99)
      }
    } finally Storage.deleteRecursively(dir)
  }
}

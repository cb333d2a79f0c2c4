package graft

import java.nio.file.Files

import graft.ops.{DedupIndex, NearDup, Storage, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted cross-corpus dedup index ([[graft.ops.DedupIndex]]):
  * bootstrap + append must equal bootstrapping the union (append is
  * maintenance, not approximation) and be idempotent; [[DedupIndex
  * .dedupNew]] must reproduce the d10 in-memory plan exactly; and
  * buckets outside the batch's probe set are provably never read. */
class DedupIndexSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, Sf001)
    .select(col("doc_id"), col("text"))

  private def fpRows(dir: java.nio.file.Path): Set[String] =
    Storage.readPartitionedVersion(spark, dir.resolve("fp"))
      .select(col("fp")).collect().map(_.getString(0)).toSet

  private def shRows(dir: java.nio.file.Path): Set[(Long, Long, Long)] =
    Storage.readPartitionedVersion(spark, dir.resolve("shingles"))
      .select(col("doc_id").cast("long"), col("g"), col("na").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("bootstrap + append == bootstrap over the union; append is idempotent") {
    val dirA = Files.createTempDirectory("dedupidx_a")
    val dirB = Files.createTempDirectory("dedupidx_b")
    try {
      val oldCorpus = docs.filter(col("doc_id") < 250)
      DedupIndex.bootstrap(dirA, oldCorpus.filter(col("doc_id") < 150), nBuckets = 16)
      DedupIndex.append(spark, dirA,
        oldCorpus.filter(col("doc_id") >= 150))
      DedupIndex.bootstrap(dirB, oldCorpus, nBuckets = 16)
      assert(fpRows(dirA) == fpRows(dirB),
        "bootstrap+append must equal indexing the whole corpus (fp)")
      assert(shRows(dirA) == shRows(dirB),
        "bootstrap+append must equal indexing the whole corpus (postings)")

      DedupIndex.append(spark, dirA, oldCorpus.filter(col("doc_id") >= 150))
      assert(fpRows(dirA) == fpRows(dirB) && shRows(dirA) == shRows(dirB),
        "re-delivered append must be a strict no-op")
    } finally { Storage.deleteRecursively(dirA); Storage.deleteRecursively(dirB) }
  }

  test("dedupNew == the in-memory d10 plan over the same corpus split") {
    val dir = Files.createTempDirectory("dedupidx_eq")
    try {
      val oldCorpus = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      DedupIndex.bootstrap(dir, oldCorpus, nBuckets = 16)
      val got = DedupIndex.dedupNew(spark, dir, batch)
        .collect().map(_.getLong(0)).toSet
      // the d10 in-memory plan, verbatim
      val exact = batch.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .join(oldCorpus.select(Text.fingerprint(col("text")).as("fp")), Seq("fp"), "left_semi")
        .select(col("doc_id"))
      val near = NearDup.jaccardPairsBetween(oldCorpus, batch, 3, 0.2)
        .select(col("doc_b").as("doc_id"))
      val expected = batch.select(col("doc_id"))
        .join(exact.unionByName(near).distinct(), Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"stored-index dedup diverged: missing=${expected -- got} extra=${got -- expected}")
      assert(got.size < batch.count(), "fixture must actually drop some duplicates")
    } finally Storage.deleteRecursively(dir)
  }

  test("probe plan shape: anti-join survivors, hash joins only, no cartesian") {
    val dir = Files.createTempDirectory("dedupidx_plan")
    try {
      DedupIndex.bootstrap(dir, docs.filter(col("doc_id") < 250), nBuckets = 16)
      val p = DedupIndex.dedupNew(spark, dir, docs.filter(col("doc_id") >= 250))
        .queryExecution.executedPlan.toString
      assert(p.contains("LeftAnti"), s"survivors must be a first-class anti join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"probe degraded to a cartesian/nested-loop join:\n$p")
    } finally Storage.deleteRecursively(dir)
  }

  test("streaming maintainer: bootstrap, appends, update+delete windows, duplicate no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.ops.MergeOps
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("dedupidx_stream")
    val base = root.resolve("corpus")
    val idx = root.resolve("idx")
    val ref = root.resolve("ref")
    def load(df: DataFrame, ts: String): Long =
      MergeOps.prunedConditionalUpsert(base,
        df.withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("doc_id"), tracked = Seq("text"),
        runTs = lit(ts).cast("timestamp"), nParts = 4, keepVersions = 8)
    try {
      val v0 = load(docs.filter(col("doc_id") < 300), "2024-01-01 00:00:00")
      val input = MemoryStream[Long]
      val q = graft.streaming.StreamingLoads.foreachBatchDedupIndexMaintain(
        input.toDF().toDF("v"), base, idx,
        trigger = Trigger.ProcessingTime(0)).start()
      try {
        input.addData(v0); q.processAllAvailable() // first delivery: bootstrap
        DedupIndex.bootstrap(ref, docs.filter(col("doc_id") < 300), nBuckets = 16)
        assert(fpRows(idx) == fpRows(ref) && shRows(idx) == shRows(ref),
          "maintainer bootstrap must equal a direct bootstrap")

        val v1 = load(docs, "2024-01-15 00:00:00") // insert-only increment
        input.addData(v1); q.processAllAvailable()
        DedupIndex.bootstrap(ref, docs, nBuckets = 16) // full-replace rebuild
        assert(fpRows(idx) == fpRows(ref) && shRows(idx) == shRows(ref),
          "maintainer append must equal indexing the whole corpus")

        val before = Storage.currentVersion(idx.resolve("fp"))
        input.addData(v1); q.processAllAvailable() // duplicate delivery
        assert(Storage.currentVersion(idx.resolve("fp")) == before,
          "duplicate delivery must not commit")
      } finally q.stop()

      // a text UPDATE and a DELETE in one window maintain incrementally:
      // pre-images leave via takedown (the OLD text names their buckets),
      // post-images land via append — the index must equal a rebuild over
      // the corrected corpus, with no stale fingerprint of the old text
      val v2 = load(
        docs.filter(col("doc_id") === 0)
          .withColumn("text", concat(col("text"), lit(" MUTATED"))),
        "2024-02-01 00:00:00")
      val v3 = MergeOps.prunedDelete(base,
        docs.filter(col("doc_id") === 7).select(col("doc_id")),
        pk = Seq("doc_id"), nParts = 4, keepVersions = 8)
      val input2 = MemoryStream[Long]
      val q2 = graft.streaming.StreamingLoads.foreachBatchDedupIndexMaintain(
        input2.toDF().toDF("v"), base, idx,
        trigger = Trigger.ProcessingTime(0)).start()
      try {
        input2.addData(v2, v3); q2.processAllAvailable()
        DedupIndex.bootstrap(ref,
          Storage.readPartitionedVersion(spark, base)
            .select(col("doc_id"), col("text")), nBuckets = 16)
        assert(fpRows(idx) == fpRows(ref) && shRows(idx) == shRows(ref),
          "update+delete window must equal a rebuild over the corrected corpus")
        val before2 = Storage.currentVersion(idx.resolve("fp"))
        input2.addData(v3); q2.processAllAvailable() // duplicate delivery
        assert(Storage.currentVersion(idx.resolve("fp")) == before2,
          "duplicate delivery after an update window must not commit")
      } finally q2.stop()
    } finally Storage.deleteRecursively(root)
  }

  test("buckets outside the batch's probe set are never read") {
    val dir = Files.createTempDirectory("dedupidx_prune")
    try {
      val oldCorpus = docs.filter(col("doc_id") < 250)
      DedupIndex.bootstrap(dir, oldCorpus, nBuckets = 64)
      val batch = docs.filter(col("doc_id") === 250)
      val before = DedupIndex.dedupNew(spark, dir, batch)
        .collect().map(_.getLong(0)).toSet

      // the probe sets, recomputed with the index's own expressions
      val fpProbed = batch
        .select(pmod(xxhash64(Text.fingerprint(col("text"))), lit(64)).cast("int").as("b"))
        .collect().map(r => s"pbucket=${r.getInt(0)}").toSet
      val shProbed = NearDup.hashedShingleSet(batch, 3)
        .select(pmod(col("g"), lit(64)).cast("int").as("b"))
        .distinct().collect().map(r => s"pbucket=${r.getInt(0)}").toSet

      // corrupt every NON-probed bucket's data files: a read that touches
      // any of them dies on parse, so an unchanged answer proves pruning
      var corrupted = 0
      for ((tname, probed) <- Seq("fp" -> fpProbed, "shingles" -> shProbed)) {
        val table = dir.resolve(tname)
        Storage.committedPartitions(table).foreach { part =>
          if (!probed.contains(part)) {
            val owner = Storage.readPartsManifest(
              table.resolve(s"v${Storage.currentVersion(table).get}"))(part)
            val pdir = table.resolve(s"v$owner").resolve(part)
            val s = Files.list(pdir)
            try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .foreach { f => Files.write(f, "JUNK".getBytes("UTF-8")); corrupted += 1 }
            finally s.close()
          }
        }
      }
      assert(corrupted > 0, "fixture must leave some buckets unprobed")
      val after = DedupIndex.dedupNew(spark, dir, batch)
        .collect().map(_.getLong(0)).toSet
      assert(after == before,
        "corrupting non-probed buckets changed (or broke) the probe — it read them")
    } finally Storage.deleteRecursively(dir)
  }

  test("takedown: O(touched buckets), equals a rebuild without the removed docs; shared fingerprints survive") {
    import spark.implicits._
    val root = Files.createTempDirectory("dedupidx_td")
    val idx = root.resolve("idx")
    val ref = root.resolve("ref")
    try {
      // controlled corpus: doc 5 and doc 6 are EXACT duplicates (shared
      // fingerprint); doc 7 is removed later; batch docs probe each case
      val mk = (id: Long, t: String) => (id, t)
      val corpus = Seq(
        mk(1L, "alpha beta gamma delta epsilon zeta eta theta"),
        mk(5L, "the quick brown fox jumps over the lazy dog tonight"),
        mk(6L, "the quick brown fox jumps over the lazy dog tonight"),
        mk(7L, "pack my box with five dozen liquor jugs right now"),
        mk(8L, "sphinx of black quartz judge my vow immediately today"))
        .toDF("doc_id", "text")
      DedupIndex.bootstrap(idx, corpus, nBuckets = 16)
      val fpV0 = Storage.currentVersion(idx.resolve("fp")).get
      val manBefore = Storage.readPartsManifest(
        idx.resolve("fp").resolve(s"v$fpV0"))
      // remove docs 6 (shared fp with 5) and 7 (unique content)
      val removed = corpus.filter(col("doc_id").isin(6L, 7L))
      DedupIndex.takedown(spark, idx, removed)
      // O(touched): only the removed docs' fingerprint buckets changed owner
      val fpV1 = Storage.currentVersion(idx.resolve("fp")).get
      val manAfter = Storage.readPartsManifest(
        idx.resolve("fp").resolve(s"v$fpV1"))
      val changed = manAfter.collect {
        case (p, v) if !manBefore.get(p).contains(v) => p }.toSet
      val expectedTouched = removed
        .select(graft.ops.Text.fingerprint(col("text")).as("fp"))
        .select(pmod(xxhash64(col("fp")), lit(16)).cast("int").as("b"))
        .collect().map(r => s"pbucket=${r.getInt(0)}").toSet
      assert(changed.subsetOf(expectedTouched),
        s"takedown must rewrite only the removed docs' buckets: $changed vs $expectedTouched")
      // state equals a rebuild over the retained corpus
      DedupIndex.bootstrap(ref, corpus.filter(!col("doc_id").isin(6L, 7L)),
        nBuckets = 16)
      assert(fpRows(idx) == fpRows(ref) && shRows(idx) == shRows(ref),
        "takedown must equal indexing the retained corpus")
      // probe: an exact copy of REMOVED-BUT-SHARED content (doc 5 kept)
      // is still a dup; a copy of doc 7's removed content now survives;
      // a near-dup of doc 8's retained content stays out
      val batch = Seq(
        mk(100L, "the quick brown fox jumps over the lazy dog tonight"),
        mk(101L, "pack my box with five dozen liquor jugs right now"),
        mk(102L, "sphinx of black quartz judge my vow immediately tonight"))
        .toDF("doc_id", "text")
      val survivors = DedupIndex.dedupNew(spark, idx, batch)
        .collect().map(_.getLong(0)).toSet
      assert(survivors == Set(101L),
        s"expected only the removed doc's copy to survive, got $survivors")
      // idempotent: a re-delivered takedown leaves the same state
      DedupIndex.takedown(spark, idx, removed)
      assert(fpRows(idx) == fpRows(ref) && shRows(idx) == shRows(ref),
        "a re-delivered takedown must be a no-op on state")
    } finally Storage.deleteRecursively(root)
  }

  test("takedown guards: no-op commits nothing, the audit catches text mismatch, old layouts fail loudly") {
    import spark.implicits._
    val root = Files.createTempDirectory("dedupidx_guard")
    val idx = root.resolve("idx")
    try {
      val corpus = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "the quick brown fox jumps over the lazy dog tonight"),
        (3L, "pack my box with five dozen liquor jugs right now"))
        .toDF("doc_id", "text")
      DedupIndex.bootstrap(idx, corpus, nBuckets = 16)
      val v0 = (Storage.currentVersion(idx.resolve("fp")).get,
        Storage.currentVersion(idx.resolve("shingles")).get)
      // a request over content the index never held touches no buckets:
      // pure no-op — the CURRENT versions come back, no version churn
      val noop = DedupIndex.takedown(spark, idx,
        corpus.filter(col("doc_id") > 100))
      assert(noop == v0 &&
        Storage.currentVersion(idx.resolve("fp")).get == v0._1 &&
        Storage.currentVersion(idx.resolve("shingles")).get == v0._2,
        "an empty takedown must not commit new versions")
      // contract breach: the request names doc 2 with the WRONG text —
      // content-addressed pruning misses its real buckets, so its rows
      // survive; the audit flag must catch exactly that (silently-kept
      // rows are the compliance hazard the feature exists to prevent)
      val wrongText = Seq((2L, "completely different words than were indexed ok"))
        .toDF("doc_id", "text")
      val e = intercept[IllegalStateException] {
        DedupIndex.takedown(spark, idx, wrongText, audit = true)
      }
      assert(e.getMessage.contains("audit FAILED") && e.getMessage.contains("2"),
        s"the audit must name the surviving ids: ${e.getMessage}")
      // the CORRECT text passes the audit and removes the doc
      DedupIndex.takedown(spark, idx,
        corpus.filter(col("doc_id") === 2L), audit = true)
      assert(Storage.readPartitionedVersion(spark, idx.resolve("fp"))
          .filter(col("doc_id") === 2L).isEmpty &&
        Storage.readPartitionedVersion(spark, idx.resolve("shingles"))
          .filter(col("doc_id") === 2L).isEmpty,
        "a correct-text takedown must remove the doc's rows")
      // PRE-DOC-ID layout (a distinct-fp table with no id column, built
      // the way the old bootstrap wrote it): append/takedown fail with
      // the explicit re-bootstrap message, not an opaque AnalysisException
      val old = root.resolve("old_idx")
      Storage.validateGeometry(old.resolve("fp"), 4)
      Storage.commitPartitions(
        corpus.select(Text.fingerprint(col("text")).as("fp")).distinct()
          .withColumn("pbucket", pmod(xxhash64(col("fp")), lit(4)).cast("int")),
        old.resolve("fp"), "pbucket")
      val e2 = intercept[IllegalArgumentException] {
        DedupIndex.append(spark, old, corpus.limit(1))
      }
      assert(e2.getMessage.contains("re-bootstrap"),
        s"old layout must ask for a re-bootstrap: ${e2.getMessage}")
    } finally Storage.deleteRecursively(root)
  }
}

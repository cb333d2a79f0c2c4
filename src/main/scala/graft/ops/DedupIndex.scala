package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained cross-corpus DEDUP index — the
  * stored-side machinery the d10 row's deploy note promises ("at 100 TB
  * the old side is just its stored fingerprint/shingle index"), made
  * real the same way [[AnnIndex]] did for ANN (VERDICT r10 item 2's
  * sibling). Layout under one directory, both tables committed through
  * [[Storage]] (versioned, snapshot-isolated, time-travelable):
  *
  *   - `fp` — DISTINCT whitespace-normalized fingerprints of every
  *     indexed document, partition-manifested on
  *     `pbucket = pmod(xxhash64(fp), nBuckets)`: an exact-dup probe for
  *     a new batch reads ONLY the buckets the batch's fingerprints hash
  *     into — O(corpus · |touched|/nBuckets) at 100 TB, never the index.
  *   - `shingles` — the inverted near-dup index: one row per
  *     (doc_id, shingle-hash g) with the doc's shingle-set size `na`
  *     denormalized on (join-free Jaccard), partitioned on
  *     `pbucket = pmod(g, nBuckets)`. A batch probe reads only its
  *     shingles' buckets and does batch-shingles × stored-postings work —
  *     no old×old pairs, exactly [[NearDup.jaccardPairsBetween]]'s
  *     cross-only cost, but against stored postings instead of a
  *     recompute of the whole old corpus.
  *
  * Maintenance: [[append]] encodes ONLY the new batch and rewrites ONLY
  * the buckets it touches (idempotent: a re-delivered doc_id replaces
  * its fingerprint and posting rows). The corpus contract is APPEND-OR-
  * TAKEDOWN: a training set grows, and [[takedown]] removes documents —
  * the right-to-be-forgotten flow — in O(request + touched buckets),
  * never a rebuild. An in-place text UPDATE is still out of contract
  * (re-[[bootstrap]] over the corrected corpus). Fingerprints are stored
  * PER DOC (not as a distinct set) exactly so a takedown can be precise:
  * a fingerprint shared with a surviving duplicate stays visible through
  * that doc's own row, and exact-dup probes keep flagging copies of
  * retained content.
  *
  * Shingle/fingerprint definitions are [[Text.fingerprint]] and
  * [[NearDup.hashedShingleSet]] — the SAME column expressions the batch
  * side uses, so stored-vs-recomputed can never diverge (DedupIndexSpec
  * proves [[dedupNew]] ≡ the d10 in-memory plan, and that non-probed
  * buckets are never read). */
object DedupIndex {

  private def fpT(dir: Path) = dir.resolve("fp")
  private def shT(dir: Path) = dir.resolve("shingles")

  /** The two INDEPENDENT index halves run concurrently from the driver
    * ([[Storage.inParallel]], guide §2.6): the fp and shingles tables are
    * disjoint — separate dirs, separate commit logs. Partial completion
    * on failure leaves the same per-table states a sequential failure
    * could (the two tables were never transactionally coupled — callers
    * get a version PAIR). */
  private def inParallel[A, B](a: => A, b: => B): (A, B) =
    Storage.inParallel(a, b)

  private def fpBucket(nBuckets: Int): Column =
    pmod(xxhash64(col("fp")), lit(nBuckets)).cast("int")
  private def gBucket(nBuckets: Int): Column =
    pmod(col("g"), lit(nBuckets)).cast("int")

  private def fingerprints(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))

  /** Fail loudly on a PRE-DOC-ID index layout (or a mismatched idCol):
    * the fp table once stored distinct fingerprints without the doc id,
    * and [[Storage.declaredGeometry]] checks only bucket count — an
    * append/takedown against the old layout would otherwise surface as an
    * opaque missing-column AnalysisException deep inside a join. Schema
    * probe only (manifest metadata, no data read). */
  private def requireDocLayout(spark: SparkSession, dir: Path, idCol: String): Unit = {
    val cols = Storage.readPartitionedVersion(spark, fpT(dir)).columns
    require(cols.contains(idCol),
      s"dedup index at $dir stores fingerprints without a '$idCol' column " +
        s"(pre-doc-id layout, or a different idCol — found ${cols.mkString(", ")}): " +
        "re-bootstrap the index from the corpus")
  }

  private def postings(docs: DataFrame, n: Int, idCol: String, textCol: String) = {
    val sh = NearDup.hashedShingleSet(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), n)
    sh.join(sh.groupBy("doc_id").agg(count(lit(1)).as("na")), "doc_id")
      .select(col("doc_id").as(idCol), col("g"), col("na"))
  }

  /** Build (or REBUILD — full-replace semantics, `dropAbsent`) the index
    * from a corpus snapshot. */
  def bootstrap(
      dir: Path,
      docs: DataFrame,
      n: Int = 3,
      nBuckets: Int = 16,
      extraFiles: Map[String, String] = Map.empty,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    // record the bucket geometry at both table roots (Storage's marker
    // contract: a later call with a different nBuckets fails loudly).
    // fileStats = false on every index commit: index reads prune by
    // CONTENT-ADDRESSED bucket dir (fpBucket/gBucket), never by min/max
    // file stats, so the per-file footer pass each commit would pay is
    // pure overhead — the same contract the streaming view sinks use.
    Storage.validateGeometry(fpT(dir), nBuckets)
    Storage.validateGeometry(shT(dir), nBuckets)
    inParallel(
      Storage.commitPartitions(
        fingerprints(docs, idCol, textCol)
          .withColumn("pbucket", fpBucket(nBuckets)),
        fpT(dir), "pbucket", dropAbsent = true, extraFiles = extraFiles,
        fileStats = false),
      Storage.commitPartitions(
        postings(docs, n, idCol, textCol).withColumn("pbucket", gBucket(nBuckets)),
        shT(dir), "pbucket", dropAbsent = true, extraFiles = extraFiles,
        fileStats = false))
    ()
  }

  /** Fold a new batch in: O(batch) encode + O(touched buckets) rewrite,
    * never the index. Idempotent per doc_id. Returns the two committed
    * versions (fp, shingles). */
  def append(
      spark: SparkSession,
      dir: Path,
      newDocs: DataFrame,
      n: Int = 3,
      extraFiles: Map[String, String] = Map.empty,
      idCol: String = "doc_id",
      textCol: String = "text"): (Long, Long) = {
    val nBuckets = Storage.declaredGeometry(fpT(dir)).getOrElse(
      throw new IllegalStateException(s"no dedup index at $dir — bootstrap first"))
    Storage.validateGeometry(shT(dir), nBuckets)
    requireDocLayout(spark, dir, idCol)

    def fpHalf(): Long = {
      val encFp = fingerprints(newDocs, idCol, textCol)
        .withColumn("pbucket", fpBucket(nBuckets)).localCheckpoint()
      val fpTouched = encFp.select(col("pbucket")).distinct()
        .collect().map(r => s"pbucket=${r.get(0)}").toSet // O(buckets)
      if (fpTouched.isEmpty)
        Storage.commitPartitions(
          Storage.readPartitionedVersion(spark, fpT(dir)).limit(0), fpT(dir), "pbucket",
          extraFiles = extraFiles, fileStats = false)
      else {
        val existing = Storage.readPartitionedVersion(spark, fpT(dir), Some(fpTouched))
        // re-delivered docs replace their fingerprint rows — idempotent
        val goneFp = encFp.select(col(idCol)).distinct()
        Storage.commitPartitions(
          existing.join(goneFp, Seq(idCol), "left_anti").unionByName(encFp),
          fpT(dir), "pbucket", extraFiles = extraFiles, fileStats = false)
      }
    }
    def shHalf(): Long = {
      val encSh = postings(newDocs, n, idCol, textCol)
        .withColumn("pbucket", gBucket(nBuckets)).localCheckpoint()
      val shTouched = encSh.select(col("pbucket")).distinct()
        .collect().map(r => s"pbucket=${r.get(0)}").toSet
      if (shTouched.isEmpty)
        Storage.commitPartitions(
          Storage.readPartitionedVersion(spark, shT(dir)).limit(0), shT(dir), "pbucket",
          extraFiles = extraFiles, fileStats = false)
      else {
        val existing = Storage.readPartitionedVersion(spark, shT(dir), Some(shTouched))
        // re-delivered docs replace their postings (na may have changed
        // only via a text change, which the append-only contract forbids —
        // but replace-not-accumulate keeps re-delivery a strict no-op)
        val gone = encSh.select(col(idCol)).distinct()
        Storage.commitPartitions(
          existing.join(gone, Seq(idCol), "left_anti").unionByName(encSh),
          shT(dir), "pbucket", extraFiles = extraFiles, fileStats = false)
      }
    }
    inParallel(fpHalf(), shHalf())
  }

  /** REMOVE documents from the index — the right-to-be-forgotten /
    * takedown flow a governed 100 TB training corpus needs: O(request
    * encode + touched buckets), never a rebuild. The request must carry
    * the documents' INDEXED text (a real takedown notice names its
    * subject, and the append-only text contract means it never changed):
    * bucket placement is content-addressed, so the text names exactly
    * the buckets holding the doc's fingerprint and posting rows. A
    * fingerprint shared with a SURVIVING duplicate stays visible through
    * that doc's own row. Ids absent from the index no-op — WITHOUT
    * committing (a request that touches no buckets returns the current
    * versions; no version churn for a documented no-op) — and the call
    * is idempotent.
    *
    * CONTRACT-BREACH DETECTION (`audit = true`): content addressing is
    * also the failure mode — a caller supplying text that differs from
    * the indexed text prunes to the WRONG buckets and the doc's real
    * rows silently survive, which for this feature's stated purpose is a
    * compliance hazard. The audit re-scans BOTH tables (full read — the
    * one deliberate O(index) cost in this file, which is why it is a
    * flag and not the default) for the requested ids after the commit
    * and throws if any row survived, naming the ids. Run it on the
    * requests where proof matters; the exception means the request's
    * text does not match what was indexed — re-issue with the indexed
    * text, or re-bootstrap from the corrected corpus.
    *
    * Returns the two committed (or current, on no-op) versions
    * (fp, shingles). */
  def takedown(
      spark: SparkSession,
      dir: Path,
      docs: DataFrame,
      n: Int = 3,
      extraFiles: Map[String, String] = Map.empty,
      idCol: String = "doc_id",
      textCol: String = "text",
      audit: Boolean = false): (Long, Long) = {
    val nBuckets = Storage.declaredGeometry(fpT(dir)).getOrElse(
      throw new IllegalStateException(s"no dedup index at $dir — bootstrap first"))
    Storage.validateGeometry(shT(dir), nBuckets)
    requireDocLayout(spark, dir, idCol)

    // one shape for both tables: prune to the content-addressed touched
    // buckets, anti-join the removed ids away, and DROP buckets the
    // removal emptied from the manifest (a bucket with no surviving rows
    // writes no partition — without the explicit drop the manifest would
    // keep pointing at the OLD bucket and the removed rows would
    // resurface, the prunedDelete wiped-bucket lesson)
    def removeRows(tdir: Path, enc: DataFrame): Long = {
      val touched = enc.select(col("pbucket")).distinct()
        .collect().map(r => s"pbucket=${r.get(0)}").toSet // O(buckets)
      if (touched.isEmpty) Storage.currentVersion(tdir).getOrElse(
        // geometry file present but nothing ever committed (torn
        // bootstrap): fail with the contract error, not a bare
        // NoSuchElementException
        throw new IllegalStateException(
          s"no committed version at $tdir — bootstrap first")) // pure no-op
      else {
        val survivors = Storage.readPartitionedVersion(spark, tdir, Some(touched))
          .join(enc.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
          .localCheckpoint() // read twice: alive-bucket census + commit
        val alive = survivors.select(col("pbucket")).distinct()
          .collect().map(r => s"pbucket=${r.get(0)}").toSet
        // only manifest-present buckets can drop — a request naming
        // content the index never held touches buckets that never existed
        val present = Storage.readPartsManifest(
          tdir.resolve(s"v${Storage.currentVersion(tdir).get}")).keySet
        Storage.commitPartitions(survivors, tdir, "pbucket",
          dropParts = (touched -- alive).intersect(present),
          extraFiles = extraFiles, fileStats = false)
      }
    }
    val (vFp, vSh) = inParallel(
      removeRows(fpT(dir),
        fingerprints(docs, idCol, textCol)
          .withColumn("pbucket", fpBucket(nBuckets)).localCheckpoint()),
      removeRows(shT(dir),
        postings(docs, n, idCol, textCol)
          .withColumn("pbucket", gBucket(nBuckets)).localCheckpoint()))
    if (audit) {
      val ids = docs.select(col(idCol)).distinct().localCheckpoint()
      def survivors(tdir: Path): Array[Any] =
        Storage.readPartitionedVersion(spark, tdir) // FULL scan, by design
          .join(ids, Seq(idCol), "left_semi")
          .select(col(idCol)).distinct().collect().map(_.get(0))
      val leftovers = (survivors(fpT(dir)) ++ survivors(shT(dir))).distinct
      if (leftovers.nonEmpty) throw new IllegalStateException(
        s"takedown audit FAILED at $dir: rows survived for ids " +
          s"${leftovers.take(10).mkString(", ")} (${leftovers.length} total) — " +
          "the request's text does not match the indexed text (content-" +
          "addressed pruning missed their buckets); re-issue the takedown " +
          "with the indexed text or re-bootstrap from the corrected corpus. " +
          s"NOTE: the partially-effective takedown IS committed (fp v$vFp, " +
          s"shingle v$vSh) — this exception reports an incomplete removal, " +
          "not a rolled-back one")
    }
    (vFp, vSh)
  }

  /** Survivors of `batch` against the STORED corpus only — d10's
    * semantics (exact fingerprint dup OR near-dup at `minJ` disqualifies)
    * with the old side read from the index: both probes are
    * partition-pruned to the buckets the batch actually hashes into, and
    * the pair work is batch-postings × stored-postings in those buckets.
    * Batch-internal duplicates are NOT judged here (same as d10) —
    * dedupe the batch first ([[Text]] d1 exact / [[NearDup]] pair graph),
    * then append the survivors. */
  def dedupNew(
      spark: SparkSession,
      dir: Path,
      batch: DataFrame,
      n: Int = 3,
      minJ: Double = 0.2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nBuckets = Storage.declaredGeometry(fpT(dir)).getOrElse(
      throw new IllegalStateException(s"no dedup index at $dir — bootstrap first"))

    val bFp = fingerprints(batch, idCol, textCol)
      .withColumn("pbucket", fpBucket(nBuckets)).localCheckpoint()
    val fpBuckets = bFp.select(col("pbucket")).distinct()
      .collect().map(r => s"pbucket=${r.get(0)}").toSet
    val storedFp = Storage.readPartitionedVersion(spark, fpT(dir), Some(fpBuckets))
    val exactDups = bFp.join(storedFp, Seq("fp", "pbucket"), "left_semi")
      .select(col(idCol))

    val bSh = postings(batch, n, idCol, textCol)
      .withColumnRenamed("na", "nb")
      .withColumn("pbucket", gBucket(nBuckets)).localCheckpoint()
    val shBuckets = bSh.select(col("pbucket")).distinct()
      .collect().map(r => s"pbucket=${r.get(0)}").toSet
    val storedSh = Storage.readPartitionedVersion(spark, shT(dir), Some(shBuckets))
      .select(col(idCol).as("doc_a"), col("g"), col("na"))
    val near = storedSh
      .join(bSh.select(col(idCol).as("doc_b"), col("g"), col("nb")), Seq("g"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .filter(col("c").cast("double") /
        (col("na") + col("nb") - col("c")).cast("double") >= minJ)
      .select(col("doc_b").as(idCol))

    batch.select(col(idCol))
      .join(exactDups.unionByName(near).distinct(), Seq(idCol), "left_anti")
  }
}

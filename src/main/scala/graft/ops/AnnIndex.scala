package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained IVF+PQ index (VERDICT r10 item 2 —
  * the missing piece [[Similarity.ivfPqTopK]]'s own deployment note named:
  * "in a real deployment the codes are precomputed at ingest and this join
  * reads the m-byte codes column").
  *
  * Layout under one directory, every table committed through [[Storage]]
  * (versioned, snapshot-isolated, time-travelable like any other table):
  *   - `codes` — partition-manifested on `pcentroid` (the IVF list): one
  *     row per vector, `(vec_id, codes)`, m small ints instead of d
  *     doubles. Partitioning by list IS the search pruning: a query
  *     probing `nprobe` of `c` lists reads exactly those partitions'
  *     files and nothing else — at 100 TB the scan cost is
  *     O(corpus · nprobe / c) codes, not the corpus.
  *   - `centroids`, `codebooks` — the frozen driver-sized model from
  *     bootstrap training; appended vectors encode against it, so the
  *     index never retrains on ingest (re-gridding is a new bootstrap).
  *
  * Maintenance is the d10 incremental-corpus pattern: [[append]] encodes
  * ONLY the new batch and rewrites ONLY the lists that received vectors —
  * O(batch + touched lists), never the index. Idempotent: re-delivered
  * vec_ids replace their previous row. [[Storage.commitPartitions]]'s
  * optimistic concurrency applies as-is (two appends touching disjoint
  * lists both land).
  *
  * Query time ([[search]]): probe-list selection and ADC scoring read the
  * stored model + codes table ONLY — [[Similarity.adcPool]] takes no
  * embeddings argument, which is the type-level proof — and raw vectors
  * are joined back solely for the exact re-rank of the pool ids
  * (AnnIndexSpec additionally proves it by corrupting every non-pool
  * vector and observing an unchanged result). */
object AnnIndex {

  private def codesT(dir: Path) = dir.resolve("codes")
  private def centroidsT(dir: Path) = dir.resolve("centroids")
  private def codebooksT(dir: Path) = dir.resolve("codebooks")

  /** Cumulative count of rows encoded AGAINST the frozen model since the
    * last (re)training — the drift odometer. Rides every codes commit as
    * an extra file, like the streaming maintainer's applied-version
    * marker; monotone and conservative (a re-upsert of the same id counts
    * again — it is still a vector value the training never saw). */
  private val DriftFile = "_DRIFT"

  private def readDrift(dir: Path): Long =
    Storage.currentVersion(codesT(dir)).flatMap { v =>
      val f = codesT(dir).resolve(s"v$v").resolve(DriftFile)
      if (java.nio.file.Files.exists(f))
        Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toLong)
      else None
    }.getOrElse(0L)

  /** Fraction of the CURRENT index encoded after the model froze — the
    * quality canary sim7's red round demonstrated the need for: a frozen
    * partial-corpus model silently degrades recall as the unseen fraction
    * grows. O(index metadata + one count). */
  def driftFraction(spark: SparkSession, dir: Path): Double = {
    val n = Storage.readPartitionedVersion(spark, codesT(dir)).count()
    if (n == 0L) 0.0 else readDrift(dir).toDouble / n
  }

  /** Train-and-build: commit the model (as given — training stays the
    * caller's choice of corpus/geometry) and the full codes table.
    * Returns the codes table's committed version. */
  def bootstrap(
      dir: Path,
      embeddings: DataFrame,
      centroids: DataFrame,
      codebooks: DataFrame,
      m: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    // fileStats = false on every index commit: ANN reads prune by IVF
    // list dir (pcentroid=<id>), never by min/max file stats — the footer
    // pass per commit would be pure overhead (same as the dedup index).
    // The two model tables are disjoint: commit them concurrently
    // (Storage.inParallel, guide §2.6).
    Storage.inParallel(
      Storage.commitVersion(centroids, centroidsT(dir), fileStats = false),
      Storage.commitVersion(codebooks, codebooksT(dir), fileStats = false))
    val enc = Similarity.encodePq(embeddings, centroids, codebooks, m, idCol, vecCol)
      .withColumnRenamed("centroid_id", "pcentroid")
    Storage.commitPartitions(enc, codesT(dir), "pcentroid",
      extraFiles = Map(DriftFile -> "0"), fileStats = false)
  }

  /** Fold a new batch into the index: encode it against the FROZEN stored
    * model, then rewrite only the IVF lists that received vectors (a
    * re-delivered vec_id replaces its old row — idempotent). Cost:
    * O(batch) encode + O(touched lists) rewrite. Returns the new codes
    * version. */
  def append(
      spark: SparkSession,
      dir: Path,
      newVectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long =
    applyDelta(spark, dir, newVectors, newVectors.limit(0),
      idCol = idCol, vecCol = vecCol)

  /** One-commit incremental maintenance — the change-feed consumer shape
    * ([[graft.streaming.StreamingLoads.foreachBatchAnnIndexMaintain]]
    * drives it from a commit-log tail): `upserts` rows add-or-replace
    * their index entry; `deleteVecs` rows leave the index. BOTH carry the
    * vector — a departing row's pre-image vector is what LOCATES its IVF
    * list (same frozen model ⇒ same deterministic assignment as when it
    * was stored), keeping the rewrite pruned to touched lists instead of
    * scanning the index for the id. A vector UPDATE that moves lists must
    * appear in both frames (post-image in `upserts`, pre-image in
    * `deleteVecs`) or its old row would linger in the old list.
    * `extraFiles` commits WITH the rewrite (the streaming maintainer's
    * applied-version marker rides here, making delivery exactly-once).
    * Lists emptied by the deletes drop from the manifest explicitly.
    * Returns the new codes version. */
  def applyDelta(
      spark: SparkSession,
      dir: Path,
      upserts: DataFrame,
      deleteVecs: DataFrame,
      extraFiles: Map[String, String] = Map.empty,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val centroids = Storage.readVersion(spark, centroidsT(dir))
    val codebooks = Storage.readVersion(spark, codebooksT(dir))
    val m = codebooks.agg(max(col("sub"))).head.getInt(0) + 1
    def enc(df: DataFrame) =
      Similarity.encodePq(df, centroids, codebooks, m, idCol, vecCol)
        .withColumnRenamed("centroid_id", "pcentroid")
        .localCheckpoint() // feeds the touched-list probe AND the commit
    // the two halves encode independently (disjoint input frames) — their
    // checkpoint jobs overlap (Storage.inParallel, guide §2.6)
    val (encU, encD) = Storage.inParallel(
      enc(upserts),
      enc(deleteVecs).select(col(idCol), col("pcentroid")))
    val touched = encU.select(col("pcentroid")).union(encD.select(col("pcentroid")))
      .distinct().collect().map(r => s"pcentroid=${r.get(0)}").toSet // O(lists)
    val codes = codesT(dir)
    // drift odometer: every upsert row was encoded against a model that
    // never trained on it; carried forward explicitly (extra files do not
    // ride commits automatically)
    def withDrift(added: Long): Map[String, String] =
      extraFiles + (DriftFile -> (readDrift(dir) + added).toString)
    if (touched.isEmpty) // empty delta: carry everything, still commit the marker
      return Storage.commitPartitions(
        Storage.readPartitionedVersion(spark, codes).limit(0), codes, "pcentroid",
        extraFiles = withDrift(0L), fileStats = false)
    val existing = Storage.readPartitionedVersion(spark, codes, Some(touched))
    val gone = encU.select(col(idCol)).union(encD.select(col(idCol)))
    val next = existing.join(gone, Seq(idCol), "left_anti").unionByName(encU)
      .localCheckpoint()
    val live = next.select(col("pcentroid")).distinct()
      .collect().map(r => s"pcentroid=${r.get(0)}").toSet
    val prev = Storage.committedPartitions(codes)
    Storage.commitPartitions(next, codes, "pcentroid",
      dropParts = (touched -- live).intersect(prev),
      extraFiles = withDrift(encU.count()), fileStats = false)
  }

  /** Re-encode a full corpus snapshot against the frozen model and commit
    * it as the index's complete next state (full-replace semantics: rows
    * absent from the snapshot drop). The streaming maintainer's
    * re-bootstrap path when it lags past the base table's retention. */
  def rebuild(
      spark: SparkSession,
      dir: Path,
      snapshot: DataFrame,
      extraFiles: Map[String, String] = Map.empty,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val centroids = Storage.readVersion(spark, centroidsT(dir))
    val codebooks = Storage.readVersion(spark, codebooksT(dir))
    val m = codebooks.agg(max(col("sub"))).head.getInt(0) + 1
    val enc = Similarity.encodePq(snapshot, centroids, codebooks, m, idCol, vecCol)
      .withColumnRenamed("centroid_id", "pcentroid")
    // the model stays FROZEN here (this is the retention-lag recovery, not
    // a retrain), so re-encoding resets nothing: carry the odometer
    Storage.commitPartitions(enc, codesT(dir), "pcentroid",
      dropAbsent = true,
      extraFiles = extraFiles + (DriftFile -> readDrift(dir).toString),
      fileStats = false)
  }

  /** Quality-triggered re-bootstrap (the fix for the failure mode sim7's
    * red round demonstrated): RETRAIN the model on the current corpus —
    * same geometry as the stored model (c from the centroid count, m/ksub
    * from the codebooks) — commit it, re-encode the full snapshot against
    * it, and zero the drift odometer. Unlike [[rebuild]], which keeps the
    * frozen model, this is the one maintenance step that changes list
    * assignments, so it rewrites the whole index — the amortized cost a
    * long-lived index pays ONCE per drift threshold, not per batch. */
  def retrainBootstrap(
      spark: SparkSession,
      dir: Path,
      snapshot: DataFrame,
      kmeansIters: Int = 3,
      pqIters: Int = 2,
      extraFiles: Map[String, String] = Map.empty,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Long = {
    val oldBooks = Storage.readVersion(spark, codebooksT(dir))
    val c = Storage.readVersion(spark, centroidsT(dir)).count().toInt
    val m = oldBooks.agg(max(col("sub"))).head.getInt(0) + 1
    val ksub = oldBooks.agg(max(col("code"))).head.getInt(0) + 1
    // the coarse-quantizer and PQ trainings are independent (both read the
    // snapshot, touch disjoint model tables) — overlap them, then the two
    // model commits (Storage.inParallel, guide §2.6)
    val (centroids, codebooks) = Storage.inParallel(
      Similarity.kmeansCentroids(snapshot, c, kmeansIters, idCol, vecCol)
        .localCheckpoint(),
      Similarity.pqCodebooks(snapshot, m, ksub, pqIters, idCol, vecCol)
        .localCheckpoint())
    Storage.inParallel(
      Storage.commitVersion(centroids, centroidsT(dir), fileStats = false),
      Storage.commitVersion(codebooks, codebooksT(dir), fileStats = false))
    val enc = Similarity.encodePq(snapshot, centroids, codebooks, m, idCol, vecCol)
      .withColumnRenamed("centroid_id", "pcentroid")
    Storage.commitPartitions(enc, codesT(dir), "pcentroid",
      dropAbsent = true, extraFiles = extraFiles + (DriftFile -> "0"),
      fileStats = false)
  }

  /** Top-k by cosine against the stored index: probe the query's best
    * `nprobe` lists (a partition-pruned read of the codes table), score
    * their candidates from codes alone ([[Similarity.adcPool]]), and
    * exact-re-rank the pool against `rerankSource` (the raw-vector table;
    * only the pool ids' vectors are compared — the join is a broadcast of
    * `rerank` ids). Output schema matches [[Similarity.ivfPqTopK]]:
    * `(idCol, cos_sim)`. */
  /** [[search]] for a QUERY BATCH — the serving tier's shape: Q queries
    * per index pass instead of one. The union of all queries' probe lists
    * is ONE partition-pruned read (O(corpus · |∪lists| / c) codes, never
    * the index); each candidate is scored only for the queries that
    * probed its list (the lazy membership join — no per-query plan);
    * the ADC cut and the exact re-rank are per-query rank-limited windows
    * (WindowGroupLimit — local top-k per query before each shuffle).
    * Returns (queryIdCol, idCol, cos_sim, rk), row-identical per query to
    * Q single-query [[search]] calls (AnnIndexSpec proves it). */
  def searchBatch(
      spark: SparkSession,
      dir: Path,
      rerankSource: DataFrame,
      queries: DataFrame, // (queryIdCol, qe)
      k: Int,
      nprobe: Int,
      rerank: Int,
      queryIdCol: String = "query_id",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rerank >= k, s"rerank pool $rerank must cover k=$k")
    val centroids = Storage.readVersion(spark, centroidsT(dir))
    val codebooks = Storage.readVersion(spark, codebooksT(dir))
    val cnorm = sqrt(Similarity.dotUnits(col("cvec"), col("cvec")).cast("double"))
    // per-query probe sets: same rule and tie-break as search(); kept
    // lazy for the membership join — only the LIST UNION is collected,
    // because the list names ARE the partition pruning (O(∪lists) rows)
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("__qsim",
        when(cnorm > 0, Similarity.dotUnits(col("qe"), col("cvec")).cast("double") / cnorm)
          .otherwise(lit(Double.NegativeInfinity)))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("__qsim").desc, col("centroid_id"))))
      .filter(col("__rk") <= nprobe)
      .select(col(queryIdCol), col("centroid_id").as("pcentroid"))
      .localCheckpoint()
    val lists = probed.select(col("pcentroid")).distinct()
      .collect().map(r => s"pcentroid=${r.get(0)}").toSet
    val idx = Storage.readPartitionedVersion(spark, codesT(dir), Some(lists))
    val cand = idx.join(broadcast(probed), Seq("pcentroid"))
      .select(col(queryIdCol), col(idCol), col("codes"))
    val pool = Similarity.adcPoolBatched(cand, queries, codebooks, rerank,
      idCol, queryIdCol)
    rerankSource.join(broadcast(pool.select(col(queryIdCol), col(idCol))), Seq(idCol))
      .join(broadcast(queries), Seq(queryIdCol))
      .select(col(queryIdCol), col(idCol),
        Similarity.cosine(col(vecCol), col("qe")).as("cos_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("cos_sim").desc, col(idCol))))
      .filter(col("rk") <= k)
  }

  def search(
      spark: SparkSession,
      dir: Path,
      rerankSource: DataFrame,
      queryVec: DataFrame,
      k: Int,
      nprobe: Int,
      rerank: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank must cover k=$k")
    val centroids = Storage.readVersion(spark, centroidsT(dir))
    val codebooks = Storage.readVersion(spark, codebooksT(dir))
    // same probe-list rule as ivfTopK/ivfPqTopK; collected because the
    // list ids ARE the partition pruning — O(nprobe) driver rows
    val cnorm = sqrt(Similarity.dotUnits(col("cvec"), col("cvec")).cast("double"))
    val probed = queryVec.crossJoin(broadcast(centroids))
      .withColumn("__qsim",
        when(cnorm > 0, Similarity.dotUnits(col("qe"), col("cvec")).cast("double") / cnorm)
          .otherwise(lit(Double.NegativeInfinity)))
      .orderBy(col("__qsim").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id")).collect().map(r => s"pcentroid=${r.get(0)}").toSet
    val idx = Storage.readPartitionedVersion(spark, codesT(dir), Some(probed))
    val pool = Similarity.adcPool(idx.select(col(idCol), col("codes")),
      queryVec, codebooks, rerank, idCol)
    rerankSource.join(broadcast(pool.select(col(idCol))), Seq(idCol))
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), Similarity.cosine(col(vecCol), col("qe")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}

package graft

import java.nio.file.Files

import graft.ops.{AnnIndex, Similarity, Storage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted IVF+PQ index ([[graft.ops.AnnIndex]]): bootstrap + append
  * must reproduce exactly what encoding the full corpus against the same
  * frozen model produces (append is maintenance, not approximation); an
  * append rewrites ONLY the lists that received vectors and is idempotent;
  * search over the stored codes equals the on-the-fly
  * [[Similarity.ivfPqTopK]] given the same model; and raw vectors outside
  * the probed lists are provably never read (corrupting them cannot change
  * the result). */
class AnnIndexSpec extends SparkTestBase {

  private val M = 8
  private lazy val e = Tables.embeddings(spark, Sf001)
  private lazy val boot = e.filter(col("vec_id") % 4 =!= 0)
  private lazy val batch = e.filter(col("vec_id") % 4 === 0)
  private lazy val cents = Similarity.kmeansCentroids(boot, c = 4, iters = 2).localCheckpoint()
  private lazy val books = Similarity.pqCodebooks(boot, m = M, ksub = 8, iters = 1).localCheckpoint()

  private def indexRows(df: DataFrame, listCol: String): Set[(Long, Int, Seq[Int])] =
    df.select(col("vec_id").cast("long"), col(listCol).cast("int"),
        col("codes").cast("array<int>"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet

  private def partDirs(vdir: java.nio.file.Path): Set[String] = {
    val s = Files.list(vdir)
    try s.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.startsWith("pcentroid=")).toSet
    finally s.close()
  }

  test("bootstrap + append == full-corpus encode; append rewrites only its lists, idempotently") {
    val dir = Files.createTempDirectory("annidx_spec")
    try {
      AnnIndex.bootstrap(dir, boot, cents, books, m = M)
      val v1 = AnnIndex.append(spark, dir, batch)
      val stored = indexRows(
        Storage.readPartitionedVersion(spark, dir.resolve("codes")), "pcentroid")
      val expected = indexRows(Similarity.encodePq(e, cents, books, M), "centroid_id")
      assert(stored == expected,
        "bootstrap+append must equal encoding the whole corpus against the frozen model")

      // the append's version dir holds exactly the lists the batch landed in
      val batchLists = expected.filter(r => r._1 % 4 == 0).map(r => s"pcentroid=${r._2}")
      assert(partDirs(dir.resolve("codes").resolve(s"v$v1")) == batchLists)

      // re-delivering the same batch replaces rows, changing nothing
      AnnIndex.append(spark, dir, batch)
      val again = indexRows(
        Storage.readPartitionedVersion(spark, dir.resolve("codes")), "pcentroid")
      assert(again == expected, "append must be idempotent")
    } finally Storage.deleteRecursively(dir)
  }

  test("search == on-the-fly ivfPqTopK; vectors outside the probed lists are never read") {
    val dir = Files.createTempDirectory("annidx_spec2")
    try {
      AnnIndex.bootstrap(dir, boot, cents, books, m = M)
      AnnIndex.append(spark, dir, batch)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      def rows(df: DataFrame): Seq[(Long, Double)] =
        df.select(col("vec_id").cast("long"), col("cos_sim"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

      val got = rows(AnnIndex.search(spark, dir, e, q, k = 5, nprobe = 2, rerank = 50))
      val fly = rows(Similarity.ivfPqTopK(e, q, cents, books,
        m = M, k = 5, nprobe = 2, rerank = 50))
      assert(got == fly, s"stored-index search must equal the on-the-fly path: $got vs $fly")

      // corrupt every vector OUTSIDE the probed lists: if search read any
      // of them the result would change — it must not, because the ADC
      // stage reads codes only and the re-rank joins just the pool ids
      // (all from probed lists). Probe rule replicated from AnnIndex.
      val cnorm = sqrt(Similarity.dotUnits(col("cvec"), col("cvec")).cast("double"))
      val probed = q.crossJoin(broadcast(cents))
        .withColumn("__qsim",
          when(cnorm > 0, Similarity.dotUnits(col("qe"), col("cvec")).cast("double") / cnorm)
            .otherwise(lit(Double.NegativeInfinity)))
        .orderBy(col("__qsim").desc, col("centroid_id"))
        .limit(2).select(col("centroid_id").cast("int"))
        .collect().map(_.getInt(0)).toSet
      val assignment = Storage.readPartitionedVersion(spark, dir.resolve("codes"))
        .select(col("vec_id").cast("long"), col("pcentroid").cast("int")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val outside = assignment.collect { case (id, c) if !probed.contains(c) => id }.toSeq
      assert(outside.nonEmpty, "fixture must leave some lists unprobed")
      val d = e.select(size(col("embedding"))).head.getInt(0)
      val junk = array_repeat(lit(9.9), d)
      val corrupted = e.withColumn("embedding",
        when(col("vec_id").isin(outside.map(Long.box): _*), junk)
          .otherwise(col("embedding")))
      val gotCorrupted = rows(AnnIndex.search(spark, dir, corrupted, q,
        k = 5, nprobe = 2, rerank = 50))
      assert(gotCorrupted == got,
        "corrupting non-probed vectors changed the result — search read bytes it must not")
    } finally Storage.deleteRecursively(dir)
  }

  // The sim7 gate contract, pinned at the gate's own geometry (c=8, m=16,
  // ksub=16, nprobe=4, rerank=max(100, n/10), 80% bootstrap + 20% append):
  // (1) stored-index search ≡ on-the-fly ivfPqTopK under the model read
  // back from the index — bit-exact, the `index_agrees` flag's definition;
  // (2) a recall FLOOR against brute force. The floor is a canary, not a
  // promise of exactness: a round-12 grid (c∈{4,6,8}, nprobe→c−1,
  // iters→10, rerank→n/2) showed a frozen partial-corpus model tops out
  // at 9/10 on this corpus — true neighbors land in unprobed lists — so
  // the oracle hash pins the equivalence, and this assertion catches the
  // silent-degradation mode (a model-handling bug driving recall toward
  // zero) that an equivalence check alone would miss.
  test("frozen-model gate geometry: stored ≡ read-back-model fly, recall floor holds") {
    val dir = Files.createTempDirectory("annidx_spec3")
    try {
      val boot80 = e.filter(col("vec_id") % 5 =!= 0)
      val batch20 = e.filter(col("vec_id") % 5 === 0)
      AnnIndex.bootstrap(dir, boot80,
        Similarity.kmeansCentroids(boot80, c = 8, iters = 3),
        Similarity.pqCodebooks(boot80, m = 16, ksub = 16, iters = 2),
        m = 16)
      AnnIndex.append(spark, dir, batch20)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val rerank = math.max(100L, e.count() / 10).toInt
      def rows(df: DataFrame): Seq[(Long, Double)] =
        df.select(col("vec_id").cast("long"), col("cos_sim"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val stored = rows(AnnIndex.search(spark, dir, e, q,
        k = 10, nprobe = 4, rerank = rerank))
      val fly = rows(Similarity.ivfPqTopK(e, q,
        Storage.readVersion(spark, dir.resolve("centroids")),
        Storage.readVersion(spark, dir.resolve("codebooks")),
        m = 16, k = 10, nprobe = 4, rerank = rerank))
      assert(stored == fly,
        s"gate geometry: stored search must be bit-identical to the fly path: $stored vs $fly")
      val exact = rows(Similarity.bruteForceTopK(e, q, 10)).map(_._1).toSet
      val recall = stored.map(_._1).toSet.intersect(exact).size
      assert(recall >= 5, s"frozen-model recall collapsed: $recall/10")
    } finally Storage.deleteRecursively(dir)
  }

  test("searchBatch over the stored index is row-identical to Q single-query searches") {
    val dir = Files.createTempDirectory("annidx_batch")
    try {
      AnnIndex.bootstrap(dir, boot, cents, books, m = M)
      AnnIndex.append(spark, dir, batch)
      val queries = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val batched = AnnIndex.searchBatch(spark, dir, e, queries,
        k = 5, nprobe = 2, rerank = 50).localCheckpoint()
      assert(batched.count() == 15, "3 queries × top-5")
      (0L until 3L).foreach { qid =>
        val single = AnnIndex.search(spark, dir, e,
            e.filter(col("vec_id") === qid).select(col("embedding").as("qe")),
            k = 5, nprobe = 2, rerank = 50)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val fromBatch = batched.filter(col("query_id") === qid).orderBy(col("rk"))
          .select(col("vec_id").cast("long"), col("cos_sim"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(fromBatch == single,
          s"query $qid: batched $fromBatch != single $single")
      }
    } finally Storage.deleteRecursively(dir)
  }

  // VERDICT r11 stretch: the drift odometer and the quality-triggered
  // retrain — the guard against the silent-degradation mode sim7's red
  // round demonstrated (a frozen model accumulating vectors it never
  // trained on).
  test("drift odometer counts frozen-model encodes; retrainBootstrap retrains and resets") {
    val dir = Files.createTempDirectory("annidx_drift")
    try {
      AnnIndex.bootstrap(dir, boot, cents, books, m = M)
      assert(AnnIndex.driftFraction(spark, dir) == 0.0, "fresh bootstrap has zero drift")

      AnnIndex.append(spark, dir, batch)
      val n = e.count().toDouble
      val frac = AnnIndex.driftFraction(spark, dir)
      assert(math.abs(frac - batch.count() / n) < 1e-9,
        s"drift must equal the appended fraction, got $frac")
      // the model is still the frozen bootstrap model
      assert(Storage.readVersion(spark, dir.resolve("centroids")).collect().toSet ==
        cents.collect().toSet, "append must never retrain")

      // rebuild (frozen-model recovery) re-encodes but does NOT reset drift
      AnnIndex.rebuild(spark, dir, e)
      assert(math.abs(AnnIndex.driftFraction(spark, dir) - frac) < 1e-9,
        "rebuild keeps the frozen model, so the odometer must carry")

      AnnIndex.retrainBootstrap(spark, dir, e, kmeansIters = 2, pqIters = 1)
      assert(AnnIndex.driftFraction(spark, dir) == 0.0, "retrain must reset drift")
      // the stored model is now the full-corpus training at the SAME geometry
      val freshCents = Similarity.kmeansCentroids(e, c = 4, iters = 2)
      assert(Storage.readVersion(spark, dir.resolve("centroids")).collect().toSet ==
        freshCents.collect().toSet, "retrain must train on the current corpus")
      // and search under the retrained index still equals the fly path
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      def rows10(df: DataFrame): Seq[(Long, Double)] =
        df.select(col("vec_id").cast("long"), col("cos_sim"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val stored = rows10(AnnIndex.search(spark, dir, e, q, k = 5, nprobe = 2, rerank = 50))
      val fly = rows10(Similarity.ivfPqTopK(e, q,
        Storage.readVersion(spark, dir.resolve("centroids")),
        Storage.readVersion(spark, dir.resolve("codebooks")),
        m = M, k = 5, nprobe = 2, rerank = 50))
      assert(stored == fly, "retrained index must stay search-equivalent")
    } finally Storage.deleteRecursively(dir)
  }

  test("streaming maintainer with rebootstrapAt: crossing the drift threshold retrains the model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import graft.ops.MergeOps
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = Files.createTempDirectory("annidx_drift_stream")
    val base = root.resolve("embeddings")
    val idx = root.resolve("annidx")
    def load(df: DataFrame, ts: String): Long =
      MergeOps.prunedConditionalUpsert(base,
        df.withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("vec_id"), tracked = Seq("embedding"),
        runTs = lit(ts).cast("timestamp"), nParts = 4, keepVersions = 8)
    try {
      val sel = e.select(col("vec_id"), col("embedding"))
      val v0 = load(sel.filter(col("vec_id") % 3 =!= 0), "2024-01-01 00:00:00")
      val bootDf = Storage.readPartitionedVersion(spark, base)
        .select(col("vec_id"), col("embedding"))
      AnnIndex.bootstrap(idx, bootDf,
        Similarity.kmeansCentroids(bootDf, c = 4, iters = 2),
        Similarity.pqCodebooks(bootDf, m = M, ksub = 8, iters = 1), m = M)
      val input = MemoryStream[Long]
      val q = graft.streaming.StreamingLoads.foreachBatchAnnIndexMaintain(
        input.toDF().toDF("v"), base, idx,
        trigger = Trigger.ProcessingTime(0), rebootstrapAt = Some(0.2)).start()
      try {
        input.addData(v0); q.processAllAvailable()
        // no drift yet: the bootstrap model survives batch 1
        assert(AnnIndex.driftFraction(spark, idx) == 0.0)
        val v1 = load(sel, "2024-01-15 00:00:00") // +1/3 of the corpus
        input.addData(v1); q.processAllAvailable()
      } finally q.stop()
      // the appended third exceeded the 0.2 threshold: model retrained on
      // the full corpus, odometer reset
      assert(AnnIndex.driftFraction(spark, idx) == 0.0,
        "crossing the threshold must retrain and reset drift")
      val fullCents = Similarity.kmeansCentroids(sel, c = 4, iters = 3)
      assert(Storage.readVersion(spark, idx.resolve("centroids")).collect().toSet ==
        fullCents.collect().toSet,
        "maintainer retrain must train on the current corpus at the stored geometry")
    } finally Storage.deleteRecursively(root)
  }
}

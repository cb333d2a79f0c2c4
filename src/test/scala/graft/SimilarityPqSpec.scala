package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** IVF+PQ coverage: codebook determinism, ADC-pool recall (the property
  * the sim6 oracle row depends on), and graceful degradation when the
  * re-rank pool shrinks to k. Everything here is deterministic — fixed
  * seeds-by-id, exact fixed-point arithmetic — so the measured recall is
  * a constant of the fixture, not a flaky statistic.
  */
class SimilarityPqSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, Sf001)
  private lazy val query =
    emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
  private lazy val centroids = Similarity.kmeansCentroids(emb, c = 8, iters = 3)
  private lazy val books = Similarity.pqCodebooks(emb, m = 16, ksub = 16, iters = 2)

  test("pqCodebooks: m×ksub entries of d/m dims, bit-reproducible across runs") {
    assert(books.count() == 256)
    assert(books.select(size(col("cvec"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    val c1 = books.orderBy("sub", "code").collect().map(_.toSeq).toSeq
    val c2 = Similarity.pqCodebooks(emb, m = 16, ksub = 16, iters = 2)
      .orderBy("sub", "code").collect().map(_.toSeq).toSeq
    assert(c1 == c2, "training must be bit-reproducible")
  }

  test("ADC pool recall@10 is 1.0 on the fixture: re-ranked output equals brute force bit-for-bit") {
    val exact = Similarity.bruteForceTopK(emb, query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // nprobe = C (all lists) isolates the PQ/ADC stage…
    val pqAll = Similarity.ivfPqTopK(emb, query, centroids, books,
      m = 16, k = 10, nprobe = 8, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pqAll == exact,
      "ADC top-100 pool must contain the true top-10 (recall@rerank = 1.0)")
    // …and the sim6 configuration (nprobe=4) must also hold it
    val pq4 = Similarity.ivfPqTopK(emb, query, centroids, books,
      m = 16, k = 10, nprobe = 4, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pq4 == exact, "IVF@4/8 + ADC@100 must preserve the exact top-10")
  }

  test("corpus-scaled pool keeps recall 1.0 at the 4x corpus (sf0.1) — the property a fixed pool lost") {
    // regression pin for the off-gate sf0.1 sweep: a rerank=100 pool that
    // was perfect at 500 vectors dropped to 0.8 recall at 2000; the
    // shipped config scales the pool with n (and m=16 quantization)
    val emb1 = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val q1 = emb1.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val cent = Similarity.kmeansCentroids(emb1, c = 8, iters = 3)
    val b = Similarity.pqCodebooks(emb1, m = 16, ksub = 16, iters = 2)
    val exact = Similarity.bruteForceTopK(emb1, q1, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = Similarity.ivfPqTopK(emb1, q1, cent, b, m = 16, k = 10,
      nprobe = 4, rerank = math.max(100L, emb1.count() / 10).toInt)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact, "scaled ADC pool must preserve the exact top-10 at sf0.1")
  }

  test("rerank = k (pure ADC ordering): degrades gracefully, returns only real vectors") {
    val out = Similarity.ivfPqTopK(emb, query, centroids, books,
      m = 16, k = 10, nprobe = 8, rerank = 10).collect()
    assert(out.length == 10)
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => ids.contains(r.getLong(0))), "no ghost ids")
    val exactIds = Similarity.bruteForceTopK(emb, query, k = 10)
      .collect().map(_.getLong(0)).toSet
    // deterministic constant of the fixture: 0.3 — far above the 10/500
    // chance floor, far below the rerank=100 pool's 1.0; the gap is the
    // point (the pool width is the recall knob)
    val recall = out.map(_.getLong(0)).count(exactIds.contains) / 10.0
    assert(recall >= 0.2, s"ADC-only recall@10 collapsed to $recall")
  }
}

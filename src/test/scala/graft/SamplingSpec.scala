package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, Sf001)

  test("split is exhaustive, disjoint, and repartition-invariant") {
    val split = Sampling.deterministicSplit(docs, col("doc_id"), 26, 25)
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet.subsetOf(Set("train", "validation", "test")))
    assert(byLabel.values.sum == docs.count())
    // all three sides populated at 500 docs (26/256 ≈ 10% each way)
    assert(byLabel.keySet == Set("train", "validation", "test"))
    // membership is a function of the key, not of the partitioning
    val reshuffled = Sampling.deterministicSplit(
      docs.repartition(13, col("n_chars")), col("doc_id"), 26, 25)
      .select("doc_id", "split")
    assert(split.select("doc_id", "split").except(reshuffled).isEmpty)
  }

  test("hashSample keeps a subset that grows monotonically with keep256") {
    val small = Sampling.hashSample(docs, col("doc_id"), 32).select("doc_id")
    val large = Sampling.hashSample(docs, col("doc_id"), 128).select("doc_id")
    assert(small.except(large).isEmpty, "keep=32 must be a subset of keep=128")
    val (ns, nl, n) = (small.count(), large.count(), docs.count())
    assert(ns < nl && nl < n)
    // uniformity sanity: 128/256 keeps roughly half (loose 3-sigma bound)
    assert(math.abs(nl - n / 2.0) < 3 * math.sqrt(n * 0.25))
  }

  test("same key lands on the same side in every table (split consistency)") {
    val dSplit = Sampling.deterministicSplit(docs, col("doc_id"), 26, 25)
      .select(col("doc_id"), col("split").as("d_split"))
    val eSplit = Sampling.deterministicSplit(
      Tables.embeddings(spark, Sf001), col("vec_id"), 26, 25)
      .select(col("vec_id").as("doc_id"), col("split").as("e_split"))
    val disagree = dSplit.join(eSplit, "doc_id")
      .filter(col("d_split") =!= col("e_split")).count()
    assert(disagree == 0)
  }

  test("deterministicShuffle: identical permutation under any partitioning; new seed = new order") {
    def ranks(parts: Int, seed: String) =
      Sampling.deterministicShuffle(docs.repartition(parts), "doc_id", seed)
        .select(col("doc_id"), col("shuffle_rank"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = ranks(1, "s1")
    assert(a == ranks(11, "s1"), "shuffle order must not depend on partitioning")
    assert(a != ranks(11, "s2"), "a different seed must permute differently")
    assert(a.values.toSeq.sorted == (1L to a.size).toSeq, "ranks must be dense 1..n")
  }
}

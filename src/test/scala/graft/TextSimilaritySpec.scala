package graft

import graft.ops.{Similarity, Text}
import org.apache.spark.sql.functions._

class TextSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("shingles: n-grams, short docs yield empty array (no sequence(0,-1) trap)") {
    val out = Seq("a b c d", "a b", "", "one").toDF("text")
      .select(Text.shingles($"text", 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
  }

  test("tokens vs words: trailing empties kept by tokens, dropped by words") {
    val r = Seq("a b ").toDF("text")
      .select(Text.tokenCount($"text"), Text.wordCount($"text")).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 2)
  }

  test("fingerprint is whitespace-normalization invariant") {
    val fps = Seq("a b c", "a  b   c ", "a b  c").toDF("text")
      .select(Text.fingerprint($"text")).collect().map(_.getString(0))
    assert(fps.distinct.length == 1)
  }

  test("simhash: identical texts → distance 0; disjoint vocab → large distance") {
    val df = Seq(
      ("x", "spark shuffle partition join"),
      ("y", "spark shuffle partition join"),
      ("z", "apples pears grapes bananas melon kiwi")).toDF("id", "text")
      .select($"id", Text.simhash64($"text").as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("x") == m("y"))
    assert(java.lang.Long.bitCount(m("x") ^ m("z")) > 10)
  }

  test("simhashFingerprints (explode+agg) ≡ simhash64 (column fold) on real docs") {
    val docs = Tables.documents(spark, Sf001).limit(50)
    val bulk = graft.ops.NearDup.simhashFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val colForm = docs.select($"doc_id", Text.simhash64($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bulk == colForm)
  }

  test("simhashHammingPairs: banded candidates ≡ brute force for several (hamming, bands)") {
    val docs = Tables.documents(spark, Sf001).limit(120)
    val fps = graft.ops.NearDup.simhashFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def brute(maxH: Int) = (for {
      (ida, ha) <- fps; (idb, hb) <- fps
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= maxH
    } yield (ida, idb)).toSet
    for ((maxH, bands) <- Seq((3, 4), (5, 6), (9, 10))) {
      val got = graft.ops.NearDup.simhashHammingPairs(docs, maxH, bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(maxH), s"hamming=$maxH bands=$bands")
    }
  }

  test("jaccardPairs maxDf knob: huge cap ≡ exact, tight cap only loses pairs") {
    val docs = Tables.documents(spark, Sf001).limit(150)
    def pairs(maxDf: Option[Long]) =
      graft.ops.NearDup.jaccardPairs(docs, 3, 0.2, maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(None)
    assert(pairs(Some(1000000L)) == exact)
    val capped = pairs(Some(3L))
    assert(capped.subsetOf(exact), "capping may only DROP pairs, never invent them")
  }

  test("simhashFingerprints: wordless doc gets fingerprint 0") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "   ")).toDF("doc_id", "text")
    val m = graft.ops.NearDup.simhashFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2L) == 0L && m.size == 2)
  }

  test("cosine: self-similarity is 1.0 within 1e-9 on real embeddings") {
    val e = Tables.embeddings(spark, Sf001).limit(5)
    val sims = e.select(Similarity.cosine($"embedding", $"embedding").as("c"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("zero-norm vectors never pollute top-k (NULL cosine, not NaN-sorts-first)") {
    import org.apache.spark.sql.types._
    val e = Tables.embeddings(spark, Sf001).select($"vec_id", $"embedding")
    val dim = e.head().getSeq[Float](1).length
    val zeroRow = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(99999L, Seq.fill(dim)(0.0f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val top = Similarity.bruteForceTopK(e.unionByName(zeroRow), q, 10).collect()
    assert(!top.exists(_.getLong(0) == 99999L), "zero vector must not rank")
    assert(top.head.getLong(0) == 0L, "query's own vector still first")
    assert(!top.exists(r => r.isNullAt(1) || r.getDouble(1).isNaN))
  }

  test("decimal dot product is partitioning-invariant (bit-identical)") {
    val e = Tables.embeddings(spark, Sf001)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    def run(parts: Int) =
      Similarity.bruteForceTopK(e.repartition(parts), q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run(1) == run(7))
  }

  test("ANN recall@10: multi-probe radius trades cost for recall, IVF floor holds") {
    def ids(name: String) = graft.queries.Registry.all.find(_.name == name).get
      .fn(spark, Sf001).collect().map(_.getLong(0)).toSet
    val exact = ids("sim1_cosine_topk")
    val e = Tables.embeddings(spark, Sf001)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val planes = e.filter($"vec_id".between(1, 6))
      .agg(sort_array(collect_list(struct($"vec_id", $"embedding"))).as("ps"))
      .select(transform($"ps", p => p.getField("embedding")).as("planes"))
    val recalls = (0 to 2).map { r =>
      Similarity.lshTopK(e, q, planes, 10, probeRadius = r)
        .collect().map(_.getLong(0)).toSet.intersect(exact).size / 10.0
    }
    val ivfRecall = ids("sim4_ivf_topk").intersect(exact).size / 10.0
    info(f"recall@10: lsh(r=0/1/2)=${recalls(0)}%.1f/${recalls(1)}%.1f/${recalls(2)}%.1f ivf=$ivfRecall%.1f")
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2),
      s"widening the probe radius must not lose neighbors: $recalls")
    assert(recalls(2) >= 0.4, s"radius-2 recall collapsed: ${recalls(2)}")
    // the k-means codebook at nprobe=4 covers the full true neighborhood
    // on this corpus — sim4's oracle row asserts the same at sf0.01
    assert(ivfRecall == 1.0, s"IVF recall must be exact on the fixture: $ivfRecall")
  }

  test("kmeansCentroids: bit-identical under any partitioning") {
    val e = Tables.embeddings(spark, Sf001)
    def run(parts: Int) =
      Similarity.kmeansCentroids(e.repartition(parts), 8, 2)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1).toSeq
    assert(run(1) == run(13), "decimal-fold means must not depend on partitioning")
  }

  test("kmeansCentroids: an emptied cluster keeps its previous centroid") {
    // three identical vectors, two seeds: every vector assigns to
    // centroid 0 (cosine tie → smaller id), cluster 1 goes empty and
    // must survive with its seed vector instead of NaN/dropping out
    val dup = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cs = Similarity.kmeansCentroids(dup, 2, 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cs.size == 2)
    assert(cs(1).head > 0.99, s"empty cluster lost its seed: ${cs(1)}")
    assert(cs.values.forall(_.forall(x => !x.isNaN)))
  }

  test("jaccardPairsBetween ≡ full pair graph restricted to cross pairs") {
    val docs = Tables.documents(spark, Sf001)
    val (old_, neu) = (docs.filter($"doc_id" < 250), docs.filter($"doc_id" >= 250))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    val cross = canon(graft.ops.NearDup.jaccardPairsBetween(old_, neu, 3, 0.2))
    val full = canon(graft.ops.NearDup.jaccardPairs(docs, 3, 0.2)
      .filter($"doc_a" < 250 && $"doc_b" >= 250))
    assert(cross == full)
  }

  test("minhashLshPairs: verified output ≡ exact jaccardPairs on the corpus") {
    val docs = Tables.documents(spark, Sf001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    val exact = canon(graft.ops.NearDup.jaccardPairs(docs, 3, 0.2))
    val lsh = canon(graft.ops.NearDup.minhashLshPairs(docs, 3, 0.2))
    assert(lsh == exact, "banding recall must be 100% on the fixture " +
      s"(missed=${exact.size - lsh.size})")
  }

  test("LSH top-k: query's own vector is always in its bucket and ranked first") {
    val e = Tables.embeddings(spark, Sf001)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val planes = e.filter($"vec_id".between(1, 6))
      .agg(sort_array(collect_list(struct($"vec_id", $"embedding"))).as("ps"))
      .select(transform($"ps", p => p.getField("embedding")).as("planes"))
    val top = Similarity.lshTopK(e, q, planes, 5).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("dropDuplicatedSpans: coverage, overlap merge, whole-doc removal, short docs") {
    // doc 1 and 2 share the 3-gram "p q r"; doc 3 is untouched; doc 4 is
    // shorter than the window; doc 5 repeats a 3-gram WITHIN itself
    // (multiplicity counts); doc 6 is entirely one duplicated window.
    val docs = Seq(
      (1L, "a b p q r c d"),
      (2L, "x p q r y z w"),
      (3L, "no dups here at all"),
      (4L, "too short"),
      (5L, "m n o t m n o t"),
      (6L, "p q r")).toDF("doc_id", "text")
    val out = graft.ops.NearDup.dropDuplicatedSpans(docs, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)), r.getLong(2), r.getLong(3))).toMap

    assert(out(1L) == (("a b c d", 4L, 3L)), s"got ${out(1L)}")
    assert(out(2L) == (("x y z w", 4L, 3L)), s"got ${out(2L)}")
    assert(out(3L) == (("no dups here at all", 5L, 0L)))
    assert(out(4L) == (("too short", 2L, 0L)), "sub-window docs pass through")
    // doc 5: "m n o" and "n o t" both repeat → every token of both
    // occurrences is covered → nothing survives; overlapping windows
    // merged into one span per occurrence, not double-counted
    assert(out(5L) == ((null, 0L, 8L)), s"got ${out(5L)}")
    assert(out(6L) == ((null, 0L, 3L)), "whole-doc duplicate → NULL clean_text")
  }

  test("dropDuplicatedSpans: minCount above corpus max removes nothing") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val out = graft.ops.NearDup.dropDuplicatedSpans(docs, k = 3, minCount = 5)
      .collect()
    assert(out.forall(_.getLong(3) == 0L))
  }
}

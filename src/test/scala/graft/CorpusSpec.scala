package graft

import graft.ops.{Corpus, Sampling}
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("repetitionMetrics: hand-computed bigram shares, short/empty docs get NULL shares") {
    val docs = Seq(
      (1L, "a b a b a"),  // bigrams: ab,ba,ab,ba → n=4, max=2, all dup → top .5, dup 1.0
      (2L, "x y z"),      // xy,yz → n=2, max=1, dup 0
      (3L, "solo"),       // no bigrams
      (4L, "")            // no words
    ).toDF("doc_id", "text")
    val m = Corpus.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 4 && m(1L).getDouble(2) == 0.5 && m(1L).getDouble(3) == 1.0)
    assert(m(2L).getLong(1) == 2 && m(2L).getDouble(2) == 0.5 && m(2L).getDouble(3) == 0.0)
    assert(m(3L).getLong(1) == 0 && m(3L).isNullAt(2) && m(3L).isNullAt(3))
    assert(m(4L).getLong(1) == 0 && m(4L).isNullAt(2))
  }

  test("chunkDedup: globally-first chunk occurrence survives, ordered by (doc_id, idx)") {
    // 2-word chunks. doc 1: [a b][c d]; doc 2: [c d][e f]; doc 3: [a b][a b]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b a b"),
      (4L, "")
    ).toDF("doc_id", "text")
    val m = Corpus.chunkDedup(docs, chunkWords = 2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) == (2L, 2L)) // both first occurrences
    assert(m(2L) == (2L, 1L)) // "c d" already seen in doc 1
    assert(m(3L) == (2L, 0L)) // "a b" seen in doc 1; second occurrence loses to idx 0 of doc... both lose
    assert(m(4L) == (0L, 0L))
  }

  test("chunkDedup: short tail chunk is its own unit") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val m = Corpus.chunkDedup(docs, chunkWords = 2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) == (2L, 2L)) // [a b], [c]
    assert(m(2L) == (1L, 0L)) // [c] already taken by (doc 1, idx 1)
  }

  test("contamination: shared distinct grams counted once, benchmark excluded from output") {
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "zero one two three four five six"),   // shares 2 distinct 5-grams
      (2L, "nothing in common here at all")       // shares none
    ).toDF("doc_id", "text")
    val got = Corpus.contamination(corpus, bench, n = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("winnowing: every window contains a selected fingerprint; shared runs share one") {
    val a = "p q r s t u v w x y z aa bb cc dd"
    val b = "THE SHARED RUN p q r s t u v w x y z IS LONG ENOUGH"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val k = 4; val w = 4
    val fp = Corpus.winnowingFingerprints(docs, k, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // winnowing coverage: for each doc, consecutive selected positions
    // are at most w apart (each window selects something)
    for (d <- Seq(1L, 2L)) {
      val ps = fp.filter(_._1 == d).map(_._2).sorted
      assert(ps.nonEmpty)
      ps.zip(ps.tail).foreach { case (x, y) => assert(y - x <= w, s"gap in doc $d: $ps") }
    }
    // guarantee: a shared run of w+k-1 = 7 words forces >=1 shared hash
    // (the shared run here is 11 words long)
    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty)
  }

  test("winnowing: native WinnowSelect ≡ independent per-position column formulation on real docs") {
    // Independent oracle: position j is selected iff some window has j as
    // its rightmost minimum ⟺ max(1, j-b) <= min(j+a-W+1, n-W+1) where
    // a = right-run of strictly-greater hashes, b = left-run of >= hashes
    // (both capped at w-1). Completely different algorithm and code path
    // from the expression's rolling scan.
    val w = 4
    val docs = Tables.documents(spark, Sf001).limit(150)
    val gh = docs
      .select(col("doc_id"), graft.ops.Text.words(col("text")).as("__ws"))
      .select(col("doc_id"),
        when(size(col("__ws")) >= 4,
          transform(sequence(lit(0), size(col("__ws")) - 4),
            i => concat_ws(" ", slice(col("__ws"), i + lit(1), lit(4)))))
          .otherwise(array().cast("array<string>")).as("__gs"))
      .select(col("doc_id"),
        transform(col("__gs"), g => graft.ops.Text.md5Long(g)).as("__gh"))
    val g = col("__gh")
    val nG = size(g)
    val wEff = least(lit(w), nG)
    def run(j: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column,
        step: Int, strict: Boolean): org.apache.spark.sql.Column = {
      def chain(u: Int): org.apache.spark.sql.Column =
        if (u >= w) lit(0)
        else {
          val nb = get(g, (j + lit(step * u) - 1).cast("int"))
          val ok = if (strict) nb > v else nb >= v
          when(ok, lit(1) + chain(u + 1)).otherwise(lit(0))
        }
      chain(1)
    }
    val selected = filter(sequence(lit(1), nG), { j =>
      val v = get(g, (j - 1).cast("int"))
      val a = run(j, v, step = 1, strict = true)
      val b = run(j, v, step = -1, strict = false)
      greatest(lit(1), j - b) <= least(j + a - wEff + lit(1), nG - wEff + lit(1))
    })
    val independent = gh.filter(nG >= 1)
      .select(col("doc_id"), explode(transform(selected,
        j => struct(j.cast("long").as("pos"),
          get(g, (j - 1).cast("int")).as("fph")))).as("s"))
      .select(col("doc_id"), col("s.pos"), col("s.fph"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = graft.ops.Corpus.winnowingFingerprints(docs, k = 4, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == independent)
    assert(native.nonEmpty)
  }

  test("winnowing: short docs — fewer grams than w gives one window, <k words gives none") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c")).toDF("doc_id", "text")
    val fp = Corpus.winnowingFingerprints(docs, k = 4, w = 4).collect()
    // doc 1: 2 grams < w → one window over both → exactly 1 fingerprint
    assert(fp.count(_.getLong(0) == 1L) == 1)
    assert(fp.count(_.getLong(0) == 2L) == 0)
  }

  test("piiRedact: emails and phones masked globally, counts exact, clean text untouched") {
    val df = Seq(
      ("contact a.user+tag@example.co.uk or b@x.io today", 2, 0),
      ("call +1 (415) 555-0100 or 020-7946-0958 now", 0, 2),
      ("no pii in this row", 0, 0)
    ).toDF("text", "expEmails", "expPhones")
    val m = Corpus.piiRedact($"text")
    val out = df.select(col("expEmails"), col("expPhones"),
      m(0)._2.as("e"), m(1)._2.as("p"), m(2)._2.as("fp"), md5($"text").as("origFp")).collect()
    out.foreach { r =>
      assert(r.getInt(2) == r.getInt(0), s"emails: $r")
      assert(r.getInt(3) == r.getInt(1), s"phones: $r")
      val changed = r.getInt(0) + r.getInt(1) > 0
      assert((r.getString(4) != r.getString(5)) == changed)
    }
  }

  test("stratifiedHashSample: rates honored per stratum, membership = pure hash function") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedHashSample(df, $"doc_id", $"lang",
      Map("en" -> 128), default256 = 32)
    val counts = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 per stratum; expect ~500 en (128/256), ~125 xx (32/256)
    assert(counts("en") > 400 && counts("en") < 600, counts)
    assert(counts("xx") > 75 && counts("xx") < 180, counts)
    // determinism: same membership under a different partitioning
    val again = Sampling.stratifiedHashSample(df.repartition(17), $"doc_id", $"lang",
      Map("en" -> 128), default256 = 32)
    assert(again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate pair generation — the shared candidate/score pipeline
  * behind d2 (pairs), d5 (survivors) and d7 (clusters).
  *
  * Shape (the canonical sub-quadratic near-dup plan):
  *  1. explode distinct word n-gram shingles — one narrow scan;
  *  2. drop shingles with document frequency 1 (they cannot contribute to
  *     any pair; posting lists of length 1 are dead weight) — window on g;
  *  3. inverted-index self-join on the shingle → per-pair intersection
  *     counts. Both join inputs are the SAME subplan shuffled on g, so
  *     Spark reuses one exchange (ReusedExchange) — the shingle pass runs
  *     once, not twice. Deliberately NOT `persist()`ed: block-cache
  *     materialization of the exploded set is slower than the codegen'd
  *     recompute and its locks serialize the racing join sides;
  *  4. Jaccard = |∩| / (|A| + |B| - |∩|) via per-doc shingle counts.
  *
  * At 100 TB the df>1 prefilter generalizes to a df-cap (drop shingles
  * above a frequency ceiling — boilerplate grams connect everything and
  * blow up posting-list joins); the cap is a recall/cost knob left to the
  * caller there, while df>1 is exact and always safe.
  */
object NearDup {

  /** (doc_a, doc_b, hamming) for all pairs within `maxHamming` simhash
    * bits, doc_a < doc_b. Banded candidate generation with PERFECT recall
    * by pigeonhole: the 60-bit fingerprint splits into `bands` contiguous
    * bands, and any pair within hamming ≤ bands-1 must agree on at least
    * one whole band — so `bands > maxHamming` makes the inverted-index
    * band join lossless and the exact hamming filter restores precision.
    * Never all-pairs; candidates cost O(Σ band-bucket²). */
  def simhashHammingPairs(docs: DataFrame, maxHamming: Int, bands: Int = 4): DataFrame = {
    require(bands > maxHamming,
      s"pigeonhole needs bands > maxHamming (got $bands bands for hamming $maxHamming)")
    require(60 % bands == 0, s"bands must divide 60 (got $bands)")
    val width = 60 / bands
    val mask = (1L << width) - 1
    val fp = simhashFingerprints(docs)
    val banded = fp.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          call_function("shiftright", col("simhash"), lit(width * b))
            .bitwiseAND(lit(mask)).as("bv"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Text.hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct() // a pair can agree on several bands
      .filter(col("hamming") <= maxHamming)
  }

  /** (doc_id, simhash): [[Text.simhash64]] re-shaped for bulk computation —
    * explode tokens once, ONE md5 per token, 60 map-side-combinable
    * bit-count sums per doc, fingerprint assembled from the counts
    * (2·Σbitᵢ > n ⟺ the ±1 counter is positive — same value, bit for bit;
    * SimhashSpec asserts equality against the column form). The
    * nested-lambda column form allocates a 60-int array per token inside
    * codegen — this form is the d3 lesson (explode+agg beats k-way lambda)
    * applied to simhash: ~10× on bulk corpora. Docs with no words get
    * fingerprint 0, matching the column form. */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(Text.words(col("text"))).as("w"))
      .withColumn("h", Text.md5Long(col("w")))
    val sums = (0 until 60).map(i =>
      sum(call_function("shiftright", col("h"), lit(i)).bitwiseAND(lit(1L))).as(s"s$i"))
    val counted = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sums: _*)
    val fp = counted.select(col("doc_id"),
      (0 until 60).map(i =>
        when(col(s"s$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
    docs.select(col("doc_id"))
      .join(fp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** (doc_id, g) — each doc's DISTINCT hashed word n-gram shingles, one
    * row per gram. The shared candidate-generation input for d2/d5/d7
    * (Jaccard) and d3 (minhash): gram VALUES never reach any output,
    * only gram equality does, so each gram is an 8-byte xxhash64 of its
    * word hashes rather than a "w1 w2 w3" string — downstream
    * exchanges, sorts and joins compare longs (collision mass across
    * ~1e6 grams ≈ 1e-8, the standard shingle-sketch trade).
    *
    * Plan shape matters more than the hash: higher-order functions
    * (transform/filter) are NOT whole-stage-codegen'd — they evaluate
    * interpreted, re-computing their child per reference. Inlining
    * words(text) into the gram lambda re-split the text ~3× per row
    * (measured 2.0 s for 5000 docs); materializing the word array, then
    * the word-hash array, in their OWN projections drops that to
    * 0.3 s. CollapseProject leaves the boundaries alone because each
    * array is referenced several times by non-cheap expressions. */
  def hashedShingleSet(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), Text.words(col("text")).as("__ws"))
      .select(col("doc_id"), transform(col("__ws"), w => xxhash64(w)).as("__hs"))
      .select(col("doc_id"), explode(array_distinct(
        when(size(col("__hs")) >= n,
          transform(sequence(lit(0), size(col("__hs")) - n),
            i => xxhash64((1 to n).map(j => element_at(col("__hs"), i + lit(j))): _*)))
          .otherwise(array().cast("array<bigint>")))).as("g"))

  /** Shared finalization of every Jaccard variant: per-pair intersection
    * counts join per-doc set sizes; jaccard = |∩| / (|A| + |B| − |∩|);
    * threshold filter. `sizesA`/`sizesB` carry (doc_a, na) / (doc_b, nb). */
  private def jaccardFinalize(
      counts: DataFrame, sizesA: DataFrame, sizesB: DataFrame,
      minJ: Double): DataFrame =
    counts
      .join(sizesA, "doc_a")
      .join(sizesB, "doc_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** (doc_a, doc_b) MinHash/LSH candidate pairs: signature of `k`
    * universal hashes over the hashed shingle set, banded `rpb` rows per
    * band; docs sharing ≥1 band key are candidates (doc_a < doc_b).
    *
    * Distributed minhash: explode shingles once, hash once, then k
    * min-aggregates (map-side combinable — one narrow shuffle on doc_id).
    * Computing the signature as one nested array expression would redo
    * the hash pass k times and explode codegen size. The band join is an
    * inverted index on the band key — never all-pairs; cost
    * O(Σ band-bucket²), with band count k/rpb the recall knob
    * (P[candidate] = 1-(1-J^rpb)^bands). */
  def minhashLshCandidates(docs: DataFrame, n: Int, k: Int = 16, rpb: Int = 4): DataFrame = {
    require(k % rpb == 0, s"rpb must divide k (got k=$k, rpb=$rpb)")
    // universal hash family mod p = 2^31-1: a*h+b stays < 2^62, so no
    // overflow under ANSI arithmetic (Spark 4 default)
    val p = 2147483647L
    val as = (0 until k).map(i => (0x9E3779B9L * (i + 1)) % p + 1)
    val bs = (0 until k).map(i => (0xC2B2AE35L * (i + 1)) % p)
    val hashed = hashedShingleSet(docs, n)
      .withColumn("h", pmod(xxhash64(col("g")), lit(p)))
    val minCols = (0 until k).map(i =>
      min(pmod(col("h") * lit(as(i)) + lit(bs(i)), lit(p))).as(s"m$i"))
    val sig = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    // band key = xxhash64 over its rpb signature slots (band-local values
    // never reach an output, only band equality does)
    val banded = sig.select(
      col("doc_id"),
      explode(array((0 until k / rpb).map { b =>
        xxhash64(lit(b) +: (b * rpb until (b + 1) * rpb).map(i => col(s"m$i")): _*)
      }: _*)).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** The full sub-quadratic MinHash near-dup operator: LSH candidates
    * ([[minhashLshCandidates]]) verified by EXACT Jaccard computed only
    * over the candidate pairs — the textbook candidates→verify pipeline.
    * Returns (doc_a, doc_b, jaccard) with jaccard ≥ minJ.
    *
    * The verify step never touches non-candidate pairs: candidates join
    * the shingle set per side, intersections count per pair — cost
    * O(candidate-pair grams), not O(corpus²). Precision is exact by
    * construction; recall is the banding probability (the d2 exact op is
    * the ground truth the recall spec measures against). */
  def minhashLshPairs(
      docs: DataFrame, n: Int, minJ: Double,
      k: Int = 16, rpb: Int = 4): DataFrame = {
    val sh = hashedShingleSet(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val cands = minhashLshCandidates(docs, n, k, rpb)
    jaccardFinalize(
      cands
        .join(sh.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("g")), Seq("doc_b", "g"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("c")),
      sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
      sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), minJ)
  }

  /** Cross-corpus variant of [[jaccardPairs]]: pairs (doc_a ∈ left,
    * doc_b ∈ right) with Jaccard ≥ minJ — the incremental-dedup shape
    * (left = the already-deduped training set, right = the new batch).
    * The inverted-index join runs left-grams × right-grams ONLY: no
    * left×left or right×right work, so cost scales with the batch, not
    * the corpus (at deploy, left's shingle set is its stored index).
    * Inputs must be disjoint doc_id sets (pairs are emitted as-is, no
    * ordering constraint). */
  def jaccardPairsBetween(
      left: DataFrame, right: DataFrame, n: Int, minJ: Double): DataFrame = {
    val shL = hashedShingleSet(left, n)
    val shR = hashedShingleSet(right, n)
    val sizesL = shL.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val sizesR = shR.groupBy("doc_id").agg(count(lit(1)).as("nb"))
    jaccardFinalize(
      shL.select(col("doc_id").as("doc_a"), col("g"))
        .join(shR.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("c")),
      sizesL.select(col("doc_id").as("doc_a"), col("na")),
      sizesR.select(col("doc_id").as("doc_b"), col("nb")), minJ)
  }

  /** Exact substring-level dedup (the suffix-array dedup of "Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2022 —
    * re-expressed as a declarative rolling-window plan): drop every token
    * covered by a k-token window whose exact text occurs ≥ `minCount`
    * times ACROSS THE CORPUS (multiplicity, within-doc repeats included).
    * Overlapping duplicated windows merge into maximal removed spans for
    * free — coverage is per-token. Returns
    * (doc_id, clean_text, n_kept, n_removed); clean_text is NULL when a
    * document is entirely duplicated material.
    *
    * Plan shape — every stage linear in its input: window extraction is
    * one map-side pass (the token and token-hash arrays materialize in
    * their own projections — the HOF-recompute lesson from
    * [[hashedShingleSet]]); the global occurrence count is a window on g
    * consuming the single wide exchange (same trick as jaccardPairs' df
    * prefilter — no agg+join back); surviving tokens come from an
    * ANTI-JOIN of the exploded (doc_id, pos) tokens against the covered
    * positions — NOT a per-token array_contains over a per-doc covered
    * set, which is O(len²) for a long heavily-duplicated document — and
    * the document is reassembled with one per-doc sort of its kept
    * tokens. No driver-side data anywhere; at 100 TB the g-exchange
    * partitions by window hash exactly like the shingle pipelines, and
    * the token/position exchanges partition by doc. Windows are hashed
    * (xxhash64 chain) so the wide exchange moves 8-byte keys — the
    * standard shingle-sketch collision trade ([[hashedShingleSet]]). */
  def dropDuplicatedSpans(docs: DataFrame, k: Int, minCount: Long = 2): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens (got $k)")
    val toks = docs
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")
    val grams = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("__ts"))
      .select(col("doc_id"), transform(col("__ts"), w => xxhash64(w)).as("__hs"))
      .select(col("doc_id"), posexplode(
        when(size(col("__hs")) >= k,
          transform(sequence(lit(0), size(col("__hs")) - k),
            i => xxhash64((1 to k).map(j => element_at(col("__hs"), i + lit(j))): _*)))
          .otherwise(array().cast("array<bigint>"))))
      .toDF("doc_id", "wstart", "g")
    val covered = grams
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("cnt") >= minCount)
      .select(col("doc_id"),
        explode(sequence(col("wstart"), col("wstart") + lit(k - 1))).as("pos"))
    val kept = toks
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__nk"),
        array_sort(collect_list(struct(col("pos"), col("tok")))).as("__kp"))
      .select(col("doc_id"), col("__nk"),
        concat_ws(" ", transform(col("__kp"), p => p.getField("tok"))).as("__text"))
    docs
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("__nt"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("__text").as("clean_text"),
        coalesce(col("__nk"), lit(0L)).as("n_kept"),
        (col("__nt") - coalesce(col("__nk"), lit(0L))).as("n_removed"))
  }

  /** (doc_a, doc_b, jaccard) for all pairs with n-gram Jaccard ≥ minJ;
    * doc_a < doc_b. `docs` needs (doc_id, text).
    *
    * `maxDf`: the 100 TB recall/cost knob — ALSO drop shingles present in
    * more than maxDf docs. Boilerplate grams connect everything and their
    * posting lists blow up the pair join quadratically; capping them
    * loses only pairs whose entire overlap is boilerplate. None (default)
    * = exact. The oracle-compared queries always run exact. */
  def jaccardPairs(
      docs: DataFrame, n: Int, minJ: Double,
      maxDf: Option[Long] = None): DataFrame = {
    val sh = hashedShingleSet(docs, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // df prefilter as a WINDOW on g, not an agg+semi-join: the window
    // consumes the same exchange the pair self-join needs, so the whole
    // prefilter costs one per-partition sort. The agg+semi variant was
    // measured 3× slower — AQE broadcasts the df keys, which splits the
    // plan off the shared exchange and recomputes the shingle explode
    // per branch. (A posting-list formulation — groupBy g,
    // collect_list, in-array pair generation — also measured ~10%
    // slower than the reused-exchange self-join.)
    val dfCol = count(lit(1)).over(Window.partitionBy("g"))
    val keep = maxDf match {
      case Some(cap) => col("df") > 1 && col("df") <= cap
      case None      => col("df") > 1
    }
    val shared = sh.withColumn("df", dfCol).filter(keep).drop("df")
    jaccardFinalize(
      shared.as("a").join(shared.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c")),
      sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
      sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), minJ)
  }
}

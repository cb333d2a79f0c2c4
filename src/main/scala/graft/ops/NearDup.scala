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

  /** (doc_a, doc_b, jaccard) for all pairs with n-gram Jaccard ≥ minJ;
    * doc_a < doc_b. `docs` needs (doc_id, text). */
  def jaccardPairs(docs: DataFrame, n: Int, minJ: Double): DataFrame = {
    val sh = docs.select(
      col("doc_id"),
      explode(array_distinct(Text.shingles(col("text"), n))).as("g"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // df>1 prefilter as a WINDOW on g, not an agg+semi-join: the window
    // consumes the same exchange the pair self-join needs, so the whole
    // prefilter costs one per-partition sort. The agg+semi variant was
    // measured 3× slower — AQE broadcasts the df keys, which splits the
    // plan off the shared exchange and recomputes the shingle explode
    // per branch.
    val shared = sh.withColumn("df",
        count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("df") > 1).drop("df")
    shared.as("a").join(shared.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}

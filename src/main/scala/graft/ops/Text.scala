package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north star: dedup, quality, token stats, fingerprints).
  *
  * Design rules for the 100 TB path:
  *  - Everything is built-in `functions._` / higher-order array functions —
  *    whole-stage-codegen'd, no UDFs, no driver round-trips.
  *  - Hashes are md5-derived so they are deterministic, portable across
  *    engines (oracle-comparable with DuckDB), and stable across Spark
  *    versions — unlike `hash()`/`xxhash64` whose seeds are engine-private.
  *  - Pairwise similarity is never all-pairs: candidate generation goes
  *    through shingle/band buckets (inverted-index join), so cost is
  *    O(sum of bucket sizes²) with bounded buckets, not O(n²).
  */
object Text {

  /** Whitespace tokenization. Keeps empty trailing tokens (matches both
    * Postgres string_to_array and DuckDB string_split semantics). */
  def tokens(text: Column): Column = split(text, " ")

  /** Tokens with empties removed — the shape most NLP metrics want. */
  def words(text: Column): Column = filter(tokens(text), w => length(w) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))
  def wordCount(text: Column): Column = size(words(text))

  /** Deterministic 60-bit hash from md5 (portable across engines):
    * first 15 hex chars → long. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Document fingerprint: md5 of the whitespace-normalized text.
    * (Reference has no text ops; this is the exact-dedup key.) */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", words(text)))

  /** Word n-gram shingles as an array<string>, e.g. n=3 → "a b c" grams.
    * Docs shorter than n words yield an empty array (guard needed: Spark
    * `sequence(0, -1)` would count DOWN, not return empty). */
  def shingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: k values, each = min over shingles of
    * md5Long(shingle ∥ "#" ∥ i). Null when the doc has no shingles. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleArr,
        s => conv(substring(md5(concat(s, lit("#"), i.cast("string"))), 1, 15), 16, 10)
          .cast("long"))))

  /** LSH band keys: the signature split into `bands` groups of `rowsPerBand`,
    * each group md5'd into one bucket key. Docs sharing ANY band key are
    * near-dup candidates (inverted-index join on the exploded band key). */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat(b.cast("string"), lit(":"),
        md5(concat_ws(",", slice(signature, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))))))

  /** 60-bit SimHash over word tokens, computed as one fold per row (no
    * explode, no shuffle): acc[60] counters, +1/-1 per token hash bit,
    * then sign → bit. Bit shifts use `call_function` because the lambda
    * index is a Column, not a Scala Int. */
  def simhash64(text: Column): Column = {
    val hashes = transform(words(text), w => md5Long(w))
    val zero = array_repeat(lit(0), 60)
    val counters = aggregate(hashes, zero,
      (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
        (a, i) => a + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1)
          .otherwise(-1)))
    aggregate(zip_with(counters, sequence(lit(0), lit(59)),
      (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two simhash longs. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "and", "or", "is", "for", "on", "with")

  /** Quality metrics: char/word counts, mean word length, stopword ratio,
    * unique-word ratio — the standard cheap pre-filters for corpus cleaning.
    * Denominator guarded against zero words (null, matching SQL NULLIF). */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val ws = words(text)
    val nW = size(ws)
    val denom = when(nW === 0, lit(null).cast("double")).otherwise(nW.cast("double"))
    val stops = size(filter(ws, w => lower(w).isin(Stopwords: _*)))
    Seq(
      "n_chars_measured" -> length(text),
      "n_words" -> nW,
      "mean_word_len" -> (aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / denom),
      "stopword_ratio" -> (stops.cast("double") / denom),
      "uniq_word_ratio" -> (size(array_distinct(ws)).cast("double") / denom))
  }
}

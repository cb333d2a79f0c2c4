package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators for training-data pipelines: repetition
  * quality (Gopher-style), sub-document dedup (C4-style), benchmark
  * contamination, PII redaction.
  *
  * All gram/chunk equality is computed on xxhash64'd values via the
  * staged-projection shape (see [[NearDup.hashedShingleSet]]): the
  * text of a gram never reaches any output — only counts do — so
  * every exchange and join compares 8-byte longs. The DuckDB oracles
  * recompute the same counts from string grams; collision mass across
  * ~1e6 grams (~1e-8) is the standard sketch trade.
  */
object Corpus {

  /** Per-doc word-bigram OCCURRENCES (not distinct), hashed. The
    * repetition-metric input: one row per bigram occurrence. */
  private def bigramOccurrences(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Text.words(col("text")).as("__ws"))
      .select(col("doc_id"), transform(col("__ws"), w => xxhash64(w)).as("__hs"))
      .select(col("doc_id"), explode(
        when(size(col("__hs")) >= 2,
          transform(sequence(lit(0), size(col("__hs")) - 2),
            i => xxhash64(element_at(col("__hs"), i + lit(1)),
              element_at(col("__hs"), i + lit(2)))))
          .otherwise(array().cast("array<bigint>"))).as("g"))

  /** Gopher-style repetition metrics per document:
    *  - `n_bigrams`: word-bigram occurrences (0 for docs under 2 words);
    *  - `top_bigram_share`: occurrences of the most frequent bigram /
    *    n_bigrams (the "top n-gram fraction" boilerplate rule);
    *  - `dup_bigram_frac`: fraction of occurrences whose bigram occurs
    *    more than once in the doc (the "duplicate n-grams" rule).
    * Shares are NULL when a doc has no bigrams (SQL NULLIF convention).
    * Two map-side-combinable aggregations; int/int → one exact IEEE
    * double division, engine-identical. */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val perGram = bigramOccurrences(docs)
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
    val perDoc = perGram.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_bigrams"),
      max(col("c")).as("max_c"),
      sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_occ"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (col("max_c").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_share"),
        (col("dup_occ").cast("double") / col("n_bigrams").cast("double"))
          .as("dup_bigram_frac"))
  }

  /** Sliding-window chunking with overlap — the RAG/pretraining chunker:
    * windows of `chunkLen` words starting every `chunkLen - overlap`
    * words (the last window may be short; empty docs yield no chunks).
    * One generate over a precomputed start sequence + a slice per chunk —
    * map-side only, no shuffle; output grows by ~chunkLen/(chunkLen -
    * overlap)× of the token volume, which is the op's intrinsic cost.
    * Returns (doc_id, chunk_idx, chunk_text, n_tokens). */
  def slidingChunks(docs: DataFrame, chunkLen: Int, overlap: Int): DataFrame = {
    require(chunkLen > 0 && overlap >= 0 && overlap < chunkLen,
      s"need 0 <= overlap < chunkLen (got chunkLen=$chunkLen overlap=$overlap)")
    val step = chunkLen - overlap
    docs
      .select(col("doc_id"), Text.words(col("text")).as("__ws"))
      .select(col("doc_id"), col("__ws"),
        explode(when(size(col("__ws")) > 0,
          sequence(lit(0), size(col("__ws")) - 1, lit(step)))
          .otherwise(array().cast("array<int>"))).as("__st"))
      .select(col("doc_id"),
        (col("__st") / step).cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__ws"), col("__st") + 1, lit(chunkLen))).as("chunk_text"),
        size(slice(col("__ws"), col("__st") + 1, lit(chunkLen))).cast("long").as("n_tokens"))
  }

  /** C4-style sub-document dedup at `chunkWords`-word granularity: each
    * doc splits into consecutive chunks; a chunk OCCURRENCE survives iff
    * it is the globally first occurrence of its text, ordered by
    * (doc_id, idx) — deterministic under any partitioning. Returns
    * (doc_id, n_chunks, n_kept); a downstream reassembly keeps the
    * surviving chunks only. One shuffle on the chunk hash. */
  def chunkDedup(docs: DataFrame, chunkWords: Int): DataFrame = {
    val ch = docs
      .select(col("doc_id"), Text.words(col("text")).as("__ws"))
      .select(col("doc_id"), explode(
        when(size(col("__ws")) >= 1,
          transform(sequence(lit(0),
              floor((size(col("__ws")) - lit(1)) / lit(chunkWords)).cast("int")),
            c => struct(c.as("idx"),
              xxhash64(concat_ws(" ",
                slice(col("__ws"), c * chunkWords + lit(1), lit(chunkWords))))
                .as("h"))))
          .otherwise(array().cast("array<struct<idx:int,h:bigint>>"))).as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.h").as("h"))
    val firstRank = row_number().over(
      Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx")))
    val ranked = ch.withColumn("kept", (firstRank === 1).cast("long"))
    val perDoc = ranked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"), sum(col("kept")).as("n_kept"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Benchmark-contamination check: docs (excluding the benchmark set)
    * sharing at least one distinct word `n`-gram with any benchmark
    * doc, with the count of shared distinct grams. The benchmark side
    * of the join is the small, fixed eval suite → broadcast; the
    * corpus side streams through map-side — the honest 100 TB shape. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val benchGrams = NearDup.hashedShingleSet(benchmark, n)
      .select(col("g")).distinct()
    NearDup.hashedShingleSet(corpus, n)
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams")) // grams are distinct per doc
  }

  /** Winnowing document fingerprints (the MOSS scheme, Schleimer et al.
    * SIGMOD'03): hash every word `k`-gram, slide a window of `w`
    * consecutive gram hashes, select each window's minimum — rightmost
    * occurrence on ties — and emit the distinct selected (pos, hash)
    * pairs. Guarantees: any shared run of w+k-1 words between two docs
    * shares ≥1 fingerprint, and ~2/(w+1) of grams are selected — a
    * bounded-size sketch with positional matching, strictly stronger
    * than one whole-doc hash for clone/plagiarism detection.
    *
    * Gram hashes are md5-derived (engine-portable — the DuckDB oracle
    * recomputes them bit-for-bit), computed per doc via the staged
    * projections; window minima are in-array lambdas — map-only, no
    * shuffle until the final distinct. Docs with fewer than k words
    * emit nothing; with fewer grams than w, one window spans them all. */
  def winnowingFingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val gh = docs
      .select(col("doc_id"), Text.words(col("text")).as("__ws"))
      .select(col("doc_id"),
        when(size(col("__ws")) >= k,
          transform(sequence(lit(0), size(col("__ws")) - k),
            i => concat_ws(" ", slice(col("__ws"), i + lit(1), lit(k)))))
          .otherwise(array().cast("array<string>")).as("__gs"))
      .select(col("doc_id"),
        transform(col("__gs"), g => Text.md5Long(g)).as("__gh"))
    // Selection runs in the native codegen'd expression
    // [[graft.plans.WinnowSelect]] (O(n) amortized rolling
    // rightmost-min over a primitive long[]): column-lambda
    // formulations of the same rule are interpreted (HOFs have no
    // codegen) and floored at ~3 s for 250k grams. Map-only — selected
    // positions are distinct by construction, so there is no distinct
    // shuffle; docs with no grams explode to zero rows. Deliberately NO
    // size(__gh)>=1 guard filter: predicate pushdown rewrites such a
    // filter to run BELOW the staged projections, re-inlining the whole
    // words→grams→md5 chain into the Filter (and the parquet
    // DataFilters) — the chain then executes twice per row (measured
    // 2.4 s vs 0.6 s). CorpusSpec cross-checks the expression against
    // an independent per-position column formulation.
    gh.select(col("doc_id"),
        explode(graft.plans.WinnowSelect(col("__gh"), w)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fph").as("fph"))
  }

  /** Sequence packing (concat-and-chunk, the GPT-style pretraining
    * layout): rows are concatenated in `idCol` order and the token stream
    * is cut into fixed `seqLen`-token training sequences. Returns, per
    * row: its token count, the first and last sequence index it lands in
    * (NULL for empty rows), and how many sequences it spans — the shuffle
    * manifest a downstream tokenizer/writer consumes.
    *
    * The global running token offset is computed WITHOUT a
    * single-partition sort (the [[Scd2.withScalableSk]] two-phase shape):
    * range-partition on `idCol`, per-partition token totals come back to
    * the driver (O(partitions) rows, never data), prefix-sum into
    * per-partition offsets, then offset + within-partition running sum.
    * The input is localCheckpointed so the totals job and the output job
    * see identical range boundaries (they come from sampling).
    *
    * `df` needs (idCol: unique total order, nTokensCol: non-negative).
    * NULL token counts are treated as 0 (coalesced up front — the
    * driver-side partition totals and the window cumsum must agree on
    * the same convention, or a NULL would sum to NULL per partition and
    * throw an opaque NPE on the driver). */
  def packSequences(
      df: DataFrame, idCol: String, nTokensCol: String, seqLen: Int,
      partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive (got $seqLen)")
    val (ranged, offsetOf) = Scd2.rangeOffsets(
      df.select(col(idCol),
        coalesce(col(nTokensCol).cast("long"), lit(0L)).as(nTokensCol)),
      Seq(idCol), col(nTokensCol), partitions)
    val wBefore = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = offsetOf + coalesce(sum(col(nTokensCol)).over(wBefore), lit(0L))
    // `div` (integer division) — Column./ on longs is DOUBLE division;
    // all quantities are non-negative so div ≡ floor division.
    ranged
      .withColumn("__cb", cumBefore)
      .select(
        col(idCol), col(nTokensCol),
        when(col(nTokensCol) > 0, expr(s"__cb div ${seqLen}L")).as("first_seq"),
        when(col(nTokensCol) > 0,
          expr(s"(__cb + `$nTokensCol` - 1L) div ${seqLen}L")).as("last_seq"))
      .withColumn("n_seqs",
        coalesce(col("last_seq") - col("first_seq") + 1, lit(0L)))
  }

  /** Token-budget selection — "fill a 10B-token training budget with the
    * best documents": rows are ranked by `ordCols` (quality-first; must be
    * a total order) and kept while the cumulative token count of all
    * STRICTLY-BETTER rows stays under `budget` — so the boundary document
    * that crosses the budget is still included (greedy prefix semantics)
    * and selection is deterministic for any partitioning.
    *
    * The global cumulative sum uses the same two-phase shape as
    * [[packSequences]] ([[Scd2.rangeOffsets]]): range partitions, O(parts)
    * driver totals, offset + within-partition window — no single-task
    * sort at any scale. Returns the kept rows with their `cum_before`. */
  def tokenBudgetSample(
      df: DataFrame, ordCols: Seq[String], nTokensCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget >= 0, s"budget must be non-negative (got $budget)")
    val (ranged, offsetOf) = Scd2.rangeOffsets(
      df.withColumn(nTokensCol, coalesce(col(nTokensCol).cast("long"), lit(0L))),
      ordCols, col(nTokensCol), partitions)
    val wBefore = Window.partitionBy(col("__pid")).orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("cum_before",
        offsetOf + coalesce(sum(col(nTokensCol)).over(wBefore), lit(0L)))
      .filter(col("cum_before") < budget)
      .drop("__pid")
  }

  /** Quality-filter funnel with FIRST-FAILING-STAGE attribution: every
    * document is counted under the first predicate (in `stages` order)
    * that rejects it, or under `survivorLabel`. The per-stage removal
    * counts are the audit view a real corpus pipeline needs — "the lang
    * filter removed 30%" is only meaningful if earlier filters already
    * took their share, so attribution order IS the semantics. Stages with
    * zero removals still appear (zero-filled) so the funnel schema is
    * stable across runs. One map-side when-chain + one count shuffle;
    * the stage list is a driver-side literal (bounded by construction). */
  def qualityFunnel(
      docs: DataFrame,
      stages: Seq[(String, Column)],
      survivorLabel: String = "survivors"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // duplicate labels would double-join their count row — sum(n_docs)
    // would exceed the doc count and the funnel silently lies
    val names = stages.map(_._1) :+ survivorLabel
    require(names.distinct.size == names.size,
      s"stage names must be distinct incl. '$survivorLabel' (got $names)")
    val chain = stages.reverse.foldLeft(lit(survivorLabel): Column) {
      case (rest, (name, pred)) => when(pred, lit(name)).otherwise(rest)
    }
    val counts = docs.select(chain.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n"))
    import docs.sparkSession.implicits._
    (stages.map(_._1) :+ survivorLabel).toDF("stage")
      .join(counts, Seq("stage"), "left")
      .select(col("stage"), coalesce(col("n"), lit(0L)).as("n_docs"))
  }

  /** Email pattern valid in BOTH Java regex (Spark) and RE2 (DuckDB). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-ish pattern: international prefix optional, ≥8 chars of
    * digits/separators, digit-bounded. Java+RE2 compatible. */
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII redaction: mask emails then phones, count matches. Pure
    * map-side column expressions (codegen'd, no shuffle). DuckDB twin:
    * regexp_replace(..., 'g') — DuckDB replaces first-match-only by
    * default where Spark is global. */
  def piiRedact(text: Column): Seq[(String, Column)] = {
    val redacted = regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
    Seq(
      "n_emails" -> size(regexp_extract_all(text, lit(EmailPattern), lit(0))),
      "n_phones" -> size(regexp_extract_all(text, lit(PhonePattern), lit(0))),
      "redacted_fp" -> md5(redacted))
  }
}

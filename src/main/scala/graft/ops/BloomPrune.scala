package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit form of Spark's runtime
  * row-level filtering (`InjectRuntimeFilter`), exposed as an operator so
  * a pipeline can prune a 100 TB probe side BEFORE its shuffle even when
  * the optimizer's own heuristics (creation-side size thresholds,
  * single-filter-per-join limits) decline to inject one.
  *
  * Shape: the build side aggregates its join keys into ONE bloom-filter
  * value (map-side partial blooms, OR-merged — a few MB total), which
  * broadcasts to every probe task; probe rows failing `might_contain`
  * drop at the SCAN side of the exchange. No false negatives — the
  * subsequent exact join sees every true match, so bloom + join ≡ join
  * (bf1's oracle asserts exactly that); false positives only cost wire
  * bytes. Worth it when the build side is selective: a 1% build side
  * turns a 100 TB probe shuffle into ~1 TB + ε·fp.
  *
  * Uses Spark's own codegen'd `BloomFilterAggregate` /
  * `BloomFilterMightContain` catalyst expressions, registered through the
  * session function registry (the same supported route FixedPointDot
  * takes); keys hash through xxhash64 on both sides, matching the
  * expressions' long-input contract.
  */
object BloomPrune {

  private val AggFn = "graft_bloom_agg"
  private val ProbeFn = "graft_bloom_might_contain"

  private def register(df: DataFrame): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val spark = castToImpl(df.sparkSession)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AggFn,
      exprs => org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ProbeFn,
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Keep only `large` rows whose `largeKey` MIGHT appear among `build`'s
    * `buildKey` values. `expectedItems`/`numBits` size the filter
    * (~`numBits/8` bytes; fp rate ≈ 0.6185^(numBits/items)).
    *
    * The bloom itself builds DISTRIBUTED (partial blooms OR-merge at the
    * final agg) and only the finished `numBits/8`-byte value returns to
    * the driver, where it inlines as a constant for the probe filter —
    * `might_contain` requires a constant/scalar-subquery bloom, and this
    * is byte-for-byte the movement a scalar subquery performs (size fixed
    * by `numBits`, independent of data volume). */
  def prunedByBloom(
      large: DataFrame, largeKey: Column,
      build: DataFrame, buildKey: Column,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    register(large)
    val bloom = build.agg(
      call_function(AggFn, xxhash64(buildKey), lit(expectedItems), lit(numBits))
        .as("__bloom"))
      .head().getAs[Array[Byte]](0)
    // empty build side → the aggregate returns null. Make the "no key can
    // match" outcome EXPLICIT instead of relying on might_contain's
    // null-bloom behavior: callers get an empty frame with the right
    // schema, consistent with the bloom+join equivalence (join against an
    // empty build yields nothing).
    if (bloom == null) large.limit(0)
    else large.filter(call_function(ProbeFn, lit(bloom), xxhash64(largeKey)))
  }
}

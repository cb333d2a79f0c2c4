package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — the reproducible-subset
  * primitives of a training-data pipeline. Random sampling (`df.sample`,
  * `sampleBy`) is seed×partitioning dependent: a backfill that repartitions
  * the input silently changes the sample. Hashing the row's KEY instead
  * makes membership a pure function of the data:
  *
  *  - stable across reruns, partitionings, and engines (md5 everywhere —
  *    the DuckDB oracle reproduces the split bit-for-bit);
  *  - consistent across tables: every table keyed by the same id lands on
  *    the same side of the split, so features/labels never straddle
  *    train/test;
  *  - map-only — no shuffle, fully codegen'd, trivially 100 TB-safe.
  *
  * Granularity is 256ths (two hex chars of md5): coarse enough to read as
  * hex thresholds in the oracle SQL, fine enough for pipeline splits.
  */
object Sampling {

  /** Stable bucket in [0, 256): the first byte of md5(key as string).
    * Uniform for any key set (md5 avalanche), independent of partition
    * order and engine. A NULL key yields a NULL bucket: every
    * comparison on it is false, so NULL-keyed rows land in
    * [[deterministicSplit]]'s "train" branch and are dropped by
    * [[hashSample]] — deterministic either way. */
  def bucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  /** Train/validation/test assignment by cumulative 256ths: bucket <
    * test256 → "test", < test256+val256 → "validation", else "train".
    * Same-key rows in ANY table get the same label. */
  def deterministicSplit(df: DataFrame, key: Column,
      test256: Int, val256: Int): DataFrame = {
    require(test256 >= 0 && val256 >= 0 && test256 + val256 <= 256,
      s"split fractions must fit in [0,256]: test=$test256 val=$val256")
    val b = bucket256(key)
    df.withColumn("split",
      when(b < test256, lit("test"))
        .when(b < test256 + val256, lit("validation"))
        .otherwise(lit("train")))
  }

  /** Keep ~keep256/256 of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, keep256: Int): DataFrame =
    df.filter(bucket256(key) < keep256)

  /** Stratified deterministic sampling: per-stratum keep rates in
    * 256ths (e.g. down-sample overrepresented languages). Same
    * map-only, engine-portable membership as [[hashSample]] — the rate
    * just switches on the stratum column. Strata absent from `rates`
    * use `default256`. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Int], default256: Int): DataFrame = {
    val threshold = rates.foldLeft(lit(default256)) {
      case (acc, (s, r)) => when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(bucket256(key) < threshold)
  }

  /** Deterministic corpus shuffle: a reproducible pseudo-random TOTAL
    * training order (GPT-style pretraining shuffles the corpus once,
    * then every epoch/restart must see the identical order). The sort
    * key is md5(seed:id) — avalanche-uniform, engine-portable, stable
    * under repartitioning — with ties broken by the id, and the dense
    * rank assigned by the [[graft.ops.Scd2.withScalableSk]] two-phase
    * shape: range-partition on the hash, O(partitions) counts to the
    * driver, offset + per-partition row_number. NO single-task global
    * window anywhere; changing `seed` is a whole new permutation. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      rankCol: String = "shuffle_rank"): DataFrame =
    Scd2.withScalableSk(
        df.withColumn("__shufkey",
          md5(concat_ws(":", lit(seed), col(idCol).cast("string")))),
        Seq("__shufkey", idCol), rankCol)
      .drop("__shufkey")
}

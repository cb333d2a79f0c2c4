package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4 / builder brief: "salting for skew").
  *
  * AQE's skew-join splitting handles shuffle-join skew at runtime; these
  * helpers cover the two shapes AQE does not:
  *
  *  - [[saltedSumCount]]: a grouped aggregation whose key distribution is
  *    pathological (one key = half the table). Phase 1 aggregates on
  *    (key, salt) — spreading the hot key over `salts` reducers — phase 2
  *    combines the partials. Works for any algebraic aggregate
  *    (sum/count/min/max here; extend with the combine expression).
  *  - [[saltedJoin]]: replicate the small side `salts` times, salt the
  *    big side's key deterministically (hash of a unique column), join on
  *    (key, salt) — a shuffle join where each hot-key shard lands on a
  *    different reducer.
  *
  * Salting trades one shuffle for uniform reducer load; the salt column
  * derives from a hash of existing data (no rand()) so results stay
  * deterministic and replayable.
  */
object Skew {

  /** Deterministic salt in [0, salts) from a unique discriminator column. */
  def saltOf(discriminator: Column, salts: Int): Column =
    pmod(xxhash64(discriminator), lit(salts)).cast("int")

  /** Two-phase salted sum/count aggregation: equivalent to
    * `df.groupBy(key).agg(sum(valueCol), count(*))` for any key skew. */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: Column,
      discriminator: Column,
      salts: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("__salt", saltOf(discriminator, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1.groupBy(col(key))
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
  }

  /** Salted join of a skewed big side against a small dim: the dim is
    * replicated `salts` times (explode), the big side salts
    * deterministically, and the join key becomes (key, salt). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      bigDiscriminator: Column,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltOf(bigDiscriminator, salts))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}

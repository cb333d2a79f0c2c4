package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fact-table construction operators (SURVEY.md §2.5, §2.6).
  *
  * The reference's fact loads are CTE pipelines: union two relationship
  * sources → DISTINCT → resolve business keys to current surrogate keys via
  * dimension joins → anti-join against the existing fact → append
  * (ref: dwh_fact_character_episode.py:45-113).
  *
  * Scale notes:
  *  - Dimension joins broadcast ([[resolveFk]] takes the dim pre-filtered to
  *    `is_current`; dims are bounded, facts are not).
  *  - The unknown-member disjunctive join (ref: dwh_fact_charer_location.py:
  *    107-112) joins on `url = url OR (url IS NULL AND id = -1)` — Catalyst
  *    cannot hash-join an OR-of-conjuncts and degrades to
  *    BroadcastNestedLoopJoin. [[unknownMemberKey]] rewrites both sides to a
  *    synthetic equi-key so the join stays a (broadcast) hash join at any
  *    scale. Semantics are identical because the seed row's natural key is
  *    NULL and real keys are non-empty (SURVEY.md §4.3).
  */
object Facts {

  /** Shared with the Catalyst rule: the NUL-embedded sentinel cannot occur
    * in any real key alphabet — a printable sentinel would silently map a
    * legitimately-equal natural key to the unknown member. */
  val UnknownSentinel: String = graft.plans.RewriteUnknownMemberJoin.Sentinel

  /** Probe-side synthetic key: NULL natural key → sentinel. */
  def unknownMemberKey(naturalKey: Column): Column =
    coalesce(naturalKey, lit(UnknownSentinel))

  /** Build-side synthetic key: the unknown-member row (id = unknownId, NULL
    * natural key) gets the sentinel; all others keep their natural key. */
  def unknownMemberDimKey(naturalKey: Column, dimId: Column, unknownId: Long = -1L): Column =
    when(dimId === unknownId, lit(UnknownSentinel)).otherwise(naturalKey)

  /** J5 as a hash join: left-join `fact` to `dim` mapping NULL fks to the
    * unknown member. `dim` must contain exactly one row with dimId = unknownId
    * and a NULL natural key. */
  def joinWithUnknownMember(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimNaturalKey: String,
      dimId: String,
      unknownId: Long = -1L): DataFrame = {
    val probe = fact.withColumn("__jk", unknownMemberKey(col(factKey)))
    val build = dim.withColumn("__jk", unknownMemberDimKey(col(dimNaturalKey), col(dimId), unknownId))
    probe.join(broadcast(build.drop(dimNaturalKey)), Seq("__jk"), "inner").drop("__jk")
  }

  /** U1: SQL `UNION` = union + distinct (Spark `union` alone does NOT dedup). */
  def unionDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** J2: business key → surrogate key through a current-version dimension.
    * Dim side broadcast: bounded cardinality by SCD2 construction.
    * `carry`: additional dim attributes to attach alongside the SK. */
  def resolveFk(
      fact: DataFrame,
      dimCurrent: DataFrame,
      factKey: String,
      dimBk: String,
      dimSk: String,
      carry: Seq[String] = Nil): DataFrame =
    fact.join(
      broadcast(dimCurrent.select(
        (col(dimBk).as(factKey) +: col(dimSk) +: carry.map(col)): _*)),
      Seq(factKey), "inner")

  /** J4/M2: incremental append — only rows whose composite PK is absent.
    * First-class `left_anti`, replacing the reference's LEFT JOIN + IS NULL
    * + redundant ON CONFLICT "safety net". */
  def incrementalAppend(existing: DataFrame, resolved: DataFrame, pk: Seq[String]): DataFrame =
    MergeOps.insertIfAbsent(existing, resolved, pk)
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-table incremental view maintenance — rolling a materialized JOIN
  * view forward from BOTH input tables' change feeds, without recomputing
  * the join.
  *
  * [[AggMaintain]] maintains a single-table aggregate from its own deltas;
  * the reference's fact loads are hand-rolled incremental JOINS (it inserts
  * only rows whose FK pair is new — dwh_fact_character_episode.py:102-107).
  * The general form both specialize is the delta-join rule: for multiset
  * relations with signed changes (insert/postimage = +1, delete/preimage =
  * −1), the new states are A₁ = A₀ + ΔA and B₁ = B₀ + ΔB, and
  *
  *     Δ(A ⋈ B) = A₁⋈B₁ − A₀⋈B₀ = ΔA ⋈ B₁  ∪  A₀ ⋈ ΔB
  *
  * (expand A₁⋈B₁ = (A₀+ΔA)⋈(B₀+ΔB); the ΔA⋈ΔB cross term belongs to
  * ΔA⋈B₁ exactly once — the asymmetry OLD-A / NEW-B is what makes the
  * two-term form exact, not an approximation). The joined delta rows carry
  * the sign of the changed side through to an additive aggregate
  * ([[AggMaintain.applyDelta]] with signed partials), so a per-key SUM/COUNT
  * view over the join advances in O(|ΔA| + |ΔB| + |touched keys|) — never
  * re-reading either full table's history.
  *
  * Scale shape: each term joins ONE small change feed against one base
  * relation — the feed side broadcasts (`broadcastDeltas`), so neither base
  * table shuffles; with manifest-pruned storage the base reads themselves
  * touch only the buckets the feed's keys hash into. This is the plan a
  * 100 TB fact⋈dim view needs: per refresh, work proportional to the
  * changes, not the table.
  */
object ViewMaintain {

  /** [[Cdc.changeDataFeed]] output (with `preImages = true`) as a signed
    * change relation: insert/update_postimage → +1, delete/update_preimage
    * → −1. The feed MUST be generated with preimages — a plain "update"
    * row has no retraction half and would double-count. */
  def signed(cdf: DataFrame, signCol: String = "sign"): DataFrame = {
    require(!cdf.columns.contains(signCol), s"'$signCol' already present in the feed")
    cdf
      .withColumn(signCol,
        when(col("change_type").isin("insert", "update_postimage"), 1)
          .when(col("change_type").isin("delete", "update_preimage"), -1)
          .otherwise(raise_error(concat(lit(
            "plain 'update' row in a signed feed — generate the CDF with " +
              "preImages=true (got change_type="), col("change_type"), lit(")"))))
          .cast("int"))
      .drop("change_type")
  }

  /** The signed delta of the inner equi-join A ⋈ B, per the rule above.
    *
    * `aOld` is A₀ (the PRE-change state of A), `bNew` is B₁ (the
    * POST-change state of B) — the asymmetry is load-bearing; swapping
    * them double- or zero-counts rows whose match changed on both sides in
    * the same interval (ViewMaintainSpec randomizes exactly that case).
    * `deltaA`/`deltaB` carry their table's columns plus `signCol`
    * ([[signed]]); an unchanged side passes an EMPTY frame with the right
    * schema. Output: A's columns ++ B's columns ++ `signCol`.
    *
    * Join keys must be non-null on the delta side to match (inner-join
    * semantics — a null key never joins, same as the recompute). A and B
    * column names must be disjoint (rename before the call; the output is
    * one flat row).
    *
    * `broadcastDeltas` (default true) marks the change-feed side of each
    * term broadcastable: a refresh's feed is small by contract, so neither
    * base relation shuffles. Disable only for a bulk backfill delta, where
    * a shuffled sort-merge join is the right plan.
    */
  def joinDelta(
      aOld: DataFrame, deltaA: DataFrame,
      bNew: DataFrame, deltaB: DataFrame,
      keysA: Seq[String], keysB: Seq[String],
      signCol: String = "sign",
      broadcastDeltas: Boolean = true): DataFrame = {
    val aCols = aOld.columns.toSeq
    val bCols = bNew.columns.toSeq
    require(keysA.size == keysB.size && keysA.nonEmpty,
      s"keysA/keysB must pair up non-empty (got $keysA vs $keysB)")
    require(aCols.intersect(bCols).isEmpty,
      s"A and B column names must be disjoint (shared: ${aCols.intersect(bCols)})")
    require(!aCols.contains(signCol) && !bCols.contains(signCol),
      s"'$signCol' must not be a data column")
    require(deltaA.columns.toSet == (aCols :+ signCol).toSet,
      s"deltaA columns ${deltaA.columns.toSeq} != A's ++ $signCol")
    require(deltaB.columns.toSet == (bCols :+ signCol).toSet,
      s"deltaB columns ${deltaB.columns.toSeq} != B's ++ $signCol")

    def bc(feed: DataFrame) = if (broadcastDeltas) broadcast(feed) else feed
    val cond = (l: String, r: String) =>
      keysA.zip(keysB).map { case (ka, kb) => col(s"$l.$ka") === col(s"$r.$kb") }
        .reduce(_ && _)

    // ΔA ⋈ B₁ — the feed broadcasts; B never shuffles
    val term1 = bc(deltaA).alias("da").join(bNew.alias("b"), cond("da", "b"))
      .select(aCols.map(c => col(s"da.$c")) ++ bCols.map(c => col(s"b.$c")) :+
        col(s"da.$signCol").as(signCol): _*)
    // A₀ ⋈ ΔB — ditto, A never shuffles
    val term2 = aOld.alias("a").join(bc(deltaB).alias("db"), cond("a", "db"))
      .select(aCols.map(c => col(s"a.$c")) ++ bCols.map(c => col(s"db.$c")) :+
        col(s"db.$signCol").as(signCol): _*)
    term1.unionByName(term2)
  }

  /** One relation of an N-ary join for [[starDelta]]: its PRE-change and
    * POST-change snapshots and, when it changed this interval, its signed
    * delta ([[signed]]; columns = `old`'s ++ the sign column). Column
    * names must be globally unique across all sides — joins and the
    * output address them by bare name. */
  final case class DeltaSide(
      old: DataFrame, nu: DataFrame, delta: Option[DataFrame])

  /** The signed delta of the N-ary INNER equi-join T₁ ⋈ … ⋈ Tₙ — the
    * generalized delta-join rule the two-table [[joinDelta]] specializes:
    *
    *     Δ(T₁⋈…⋈Tₙ) = Σᵢ  T₁⁰ ⋈ … ⋈ Tᵢ₋₁⁰ ⋈ ΔTᵢ ⋈ Tᵢ₊₁¹ ⋈ … ⋈ Tₙ¹
    *
    * (telescoping: term i accounts for exactly the change of side i
    * against earlier sides' OLD and later sides' NEW states; every cross
    * term of multiple deltas lands in exactly one term — the same
    * old/new asymmetry that makes the 2-ary rule exact). Sides whose
    * delta is None (unchanged this interval) contribute no term but
    * still participate in the others' joins.
    *
    * `pairs` are the equi-join column pairs by GLOBAL name (each name
    * belongs to exactly one side). Each term starts from its (broadcast)
    * delta and joins outward through whatever sides the pair graph
    * connects next — so the small feed drives every probe and no
    * dim ⋈ dim cross product ever forms; the pair graph must connect all
    * sides (a star's fact, or a chain, both do).
    *
    * Scale shape: per term, one broadcast feed probing n−1 base
    * relations — work O(|Δ| × fan-out), never a base-×-base shuffle.
    * Output: every side's columns ++ `signCol`. */
  def starDelta(
      sides: Seq[DeltaSide],
      pairs: Seq[(String, String)],
      signCol: String = "sign",
      broadcastDeltas: Boolean = true): DataFrame = {
    require(sides.size >= 2, "starDelta needs at least two sides")
    val colsOf = sides.map(_.old.columns.toSeq)
    val allCols = colsOf.flatten
    require(allCols.distinct.size == allCols.size,
      s"side columns must be globally unique (got $allCols)")
    require(!allCols.contains(signCol), s"'$signCol' must not be a data column")
    sides.foreach { s =>
      require(s.nu.columns.toSeq == s.old.columns.toSeq,
        s"old/new column mismatch: ${s.old.columns.toSeq} vs ${s.nu.columns.toSeq}")
      s.delta.foreach(d => require(
        d.columns.toSet == (s.old.columns.toSet + signCol),
        s"delta columns ${d.columns.toSeq} != side's ++ $signCol"))
    }
    pairs.foreach { case (a, b) =>
      require(allCols.contains(a) && allCols.contains(b),
        s"join pair ($a, $b) names an unknown column") }
    def bc(feed: DataFrame) = if (broadcastDeltas) broadcast(feed) else feed
    val outCols = allCols.map(col) :+ col(signCol)
    val terms = sides.zipWithIndex.flatMap { case (side, i) =>
      side.delta.map { d =>
        val others = sides.zipWithIndex.collect {
          case (s, j) if j < i => s.old
          case (s, j) if j > i => s.nu
        }
        joinConnected(bc(d), others, pairs).select(outCols: _*)
      }
    }
    require(terms.nonEmpty, "starDelta with every side unchanged — nothing to roll")
    terms.reduce(_.unionByName(_))
  }

  /** Greedy connectivity fold from `start`: repeatedly INNER-join the next
    * relation the pair graph reaches from the accumulated columns, with
    * every applicable pair as the equi-condition. Column names must be
    * globally unique; the pair graph must connect every relation (a
    * star's fact or a chain both do) — a stranded relation would be a
    * cross product, refused loudly. Starting from a broadcast delta, this
    * is what keeps each [[starDelta]] term feed-driven: the small side
    * probes outward and no base ⋈ base product ever forms. */
  def joinConnected(start: DataFrame, rest: Seq[DataFrame],
      pairs: Seq[(String, String)]): DataFrame = {
    var acc = start
    var remaining = rest
    while (remaining.nonEmpty) {
      val accCols = acc.columns.toSet
      val idx = remaining.indexWhere { r =>
        val rc = r.columns.toSet
        pairs.exists { case (a, b) =>
          (accCols(a) && rc(b)) || (accCols(b) && rc(a)) }
      }
      require(idx >= 0,
        s"join pair graph is disconnected (stranded: ${remaining.map(_.columns.mkString("[", ",", "]"))})")
      val r = remaining(idx)
      val rc = r.columns.toSet
      val conds = pairs.collect {
        case (a, b) if accCols(a) && rc(b) => col(a) === col(b)
        case (a, b) if accCols(b) && rc(a) => col(a) === col(b)
      }
      acc = acc.join(r, conds.reduce(_ && _))
      remaining = remaining.patch(idx, Nil, 1)
    }
    acc
  }
}

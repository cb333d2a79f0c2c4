package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of materialized aggregate tables — the datamart
  * extension of the reference's incremental fact loads (SURVEY.md §2.7 J4:
  * only NEW rows enter the warehouse each run; an aggregate table over
  * those facts must advance the same way, without rescanning history).
  *
  * Semantics: `state` holds one row per key with ADDITIVE partial
  * aggregates (counts, sums — anything where merge(a, b) = a + b) and
  * optionally MIN/MAX columns (merge = least/greatest). A delta batch is
  * pre-aggregated to the same shape, then ONE full-outer join on the keys
  * merges it into the state. Deletions/retractions are additive too: feed
  * negative counts/sums (the changelog convention); min/max do NOT support
  * retraction through [[applyDelta]] (a retractable min needs a full
  * per-key recompute) — [[applyDeltaRetractable]] closes that gap: it
  * merges what CAN be merged and FLAGS exactly the groups whose stored
  * extreme may have been retracted, so the caller recomputes only those
  * ([[MatViews.maintain]] wires the flagged-group recompute to a
  * stats-pruned base scan).
  *
  * Scale shape: the delta aggregation is map-side combinable and its
  * output is |delta keys| rows — tiny against the state; the join
  * shuffles on the SAME keys every run, so with key-bucketed state
  * storage it is exchange-free on the state side. This is O(|delta| +
  * |touched keys|) per run versus O(|history|) for recompute — the only
  * viable shape at 100 TB.
  */
object AggMaintain {

  /** Pre-aggregate a raw delta to the state's shape: one row per key with
    * count_rows plus sum/min/max partials. `sums` values fold in DECIMAL
    * (exact, order-independent — Registry determinism conventions). */
  def deltaAggregates(
      delta: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column],
      mins: Map[String, Column] = Map.empty,
      maxs: Map[String, Column] = Map.empty): DataFrame = {
    val aggs =
      sums.map { case (n, c) => sum(c).as(n) } ++
        mins.map { case (n, c) => min(c).as(n) } ++
        maxs.map { case (n, c) => max(c).as(n) }
    delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("count_rows"), aggs.toSeq: _*)
  }

  /** Merge a pre-aggregated `deltaAgg` into `state` (same schema: keys ++
    * count_rows ++ sumCols ++ minCols ++ maxCols). `state` must be unique
    * on `keys` (it is an aggregate table); `deltaAgg` is unique by
    * construction. Keys absent from one side pass through; keys present
    * in both merge column-wise (+ / least / greatest). */
  /** @param assumeKeysNonNull caller-asserted: no key is ever null on
    *        either side (parquet schemas report nullable even for columns
    *        that never are, defeating the automatic check). With null
    *        keys present this assumption would DUPLICATE those rows
    *        instead of merging them — only assert what the pipeline
    *        guarantees.
    * @param validateKeys belt-and-suspenders for the assertion above:
    *        eagerly count null keys in `deltaAgg` (tiny — one row per
    *        delta key) and fail loudly if any exist. State rows only ever
    *        originate from deltas, so validating each delta inductively
    *        keeps the state clean without scanning it. */
  def applyDelta(
      state: DataFrame,
      deltaAgg: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty,
      assumeKeysNonNull: Boolean = false,
      validateKeys: Boolean = false): DataFrame = {
    if (assumeKeysNonNull && validateKeys) {
      val nulls = deltaAgg
        .filter(keys.map(col(_).isNull).reduce(_ || _)).count()
      require(nulls == 0,
        s"assumeKeysNonNull is set but the delta has $nulls null-keyed " +
          s"row(s) on ${keys.mkString(",")} — they would duplicate instead of merge")
    }
    val order = keys ++ Seq("count_rows") ++ sumCols ++ minCols ++ maxCols
    val s = state.select(order.map(col): _*).alias("s")
    val d = deltaAgg.select(order.map(col): _*).alias("d")
    // join with plain equality when every key is non-nullable on both
    // sides: null-safe <=> keys make the planner hash COALESCED key
    // tuples, which can't reuse the upstream aggregations' partitioning —
    // a wasted extra exchange pair on both inputs (measured in the m7
    // plan). Nullable keys genuinely need <=> (a null key is a real
    // group) and pay the shuffle.
    def keysNullable(df: DataFrame) =
      df.schema.filter(f => keys.contains(f.name)).exists(_.nullable)
    val nullSafe =
      !assumeKeysNonNull && (keysNullable(state) || keysNullable(deltaAgg))
    val eq: (Column, Column) => Column = if (nullSafe) _ <=> _ else _ === _
    val joined = s.join(d,
      keys.map(k => eq(col(s"s.$k"), col(s"d.$k"))).reduce(_ && _), "full_outer")
    def merged(c: String, combine: (Column, Column) => Column): Column = {
      val (sc, dc) = (col(s"s.$c"), col(s"d.$c"))
      // null-on-one-side = key absent there → pass the other side through
      // (coalesce-to-zero would turn "no observation" of a min into 0)
      when(sc.isNull, dc).when(dc.isNull, sc).otherwise(combine(sc, dc)).as(c)
    }
    joined.select(
      keys.map(k => coalesce(col(s"d.$k"), col(s"s.$k")).as(k)) ++
        Seq(merged("count_rows", _ + _)) ++
        sumCols.map(c => merged(c, _ + _)) ++
        minCols.map(c => merged(c, least(_, _))) ++
        maxCols.map(c => merged(c, greatest(_, _))): _*)
      // a fully-retracted key (count_rows reaches 0) must DISAPPEAR, as it
      // would from a recompute — a ghost (0, zeroed-sums, stale-min/max)
      // row would otherwise persist in the state forever
      .filter(col("count_rows") =!= 0)
  }

  /** [[deltaAggregates]] over a PRE-IMAGE change feed
    * ([[Cdc.changeDataFeed]] with `preImages = true`, or any changelog
    * whose `change_type` is insert / delete / update_preimage /
    * update_postimage): counts and sums fold SIGNED (+1 for
    * insert/postimage rows, −1 for delete/preimage rows); min/max —
    * which cannot fold through a retraction — instead emit a partial
    * PAIR per column: `__ins_<name>` (the extreme over added rows,
    * mergeable) and `__ret_<name>` (the extreme over retracted rows,
    * used by [[applyDeltaRetractable]] only to decide whether the stored
    * extreme might be gone). Map-side combinable throughout; output is
    * one row per touched key.
    *
    * `weight` is a per-row multiplicity (≥1) for PRE-CANCELED feeds
    * ([[ViewMaintain.starDelta]] net rows): counts and sums scale by it;
    * extremes ignore it (k copies of a value have its value). IMPORTANT —
    * a feed whose insert/retract rows can CANCEL (the same value added
    * and removed by different join-delta terms) must be canceled to net
    * multiplicities BEFORE this call: [[applyDeltaRetractable]]'s
    * ins-ties-ret exemption is proved on the premise that an inserted
    * value exists in the after-state and a retracted one existed before,
    * which raw multi-term deltas violate (a transient pair could bait the
    * exemption into keeping a phantom extreme). */
  def retractableDeltaAggregates(
      cdf: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column],
      mins: Map[String, Column] = Map.empty,
      maxs: Map[String, Column] = Map.empty,
      changeType: Column = col("change_type"),
      weight: Column = lit(1L),
      kmvs: Map[String, (Column, Int)] = Map.empty): DataFrame = {
    val added = changeType.isin("insert", "update_postimage")
    val aggs =
      sums.map { case (n, c) =>
        sum(when(added, c).otherwise(-c) * weight).as(n) } ++
        mins.flatMap { case (n, c) => Seq(
          min(when(added, c)).as(s"__ins_$n"),
          min(when(!added, c)).as(s"__ret_$n")) } ++
        maxs.flatMap { case (n, c) => Seq(
          max(when(added, c)).as(s"__ins_$n"),
          max(when(!added, c)).as(s"__ret_$n")) } ++
        // KMV sketch partials: inserts fold into a mergeable k-min array;
        // for retractions only the SMALLEST retracted hash matters — the
        // merge flags a recompute iff it could sit inside the stored
        // sketch (hashes can't be removed from a k-min set). The hash
        // dispatches on the column's resolved type (strings pre-hash
        // through the md5-prefix long, in lock-step with the aggregate)
        kmvs.flatMap { case (n, (c, k)) => Seq(
          graft.plans.KmvSketch.partialCol(when(added, c), k).as(s"__ins_$n"),
          min(when(!added, graft.plans.KmvSketch.hashCol(c,
            cdf.select(c).schema.head.dataType))).as(s"__ret_$n")) }
    cdf.groupBy(keys.map(col): _*)
      .agg(sum(when(added, weight).otherwise(-weight)).as("count_rows"),
        aggs.toSeq: _*)
  }

  /** The retraction-aware counterpart of [[applyDelta]]: merge a
    * [[retractableDeltaAggregates]] batch into `state`. Counts and sums
    * merge additively exactly as [[applyDelta]] does; each min/max column
    * merges as `least/greatest(stored, __ins)` — which is CORRECT unless
    * a retracted value ties-or-beats the stored extreme, in which case
    * the stored extreme itself may be the row that left and only a
    * recompute over the group's surviving rows can answer. Those groups
    * — and ONLY those — come back with `flagCol = true` and their min/max
    * columns carrying the (possibly stale) merged guess; every other
    * row's extremes are exact. The caller overwrites flagged extremes
    * from a recompute ([[MatViews.maintain]]); a fully-retracted key
    * (count 0) disappears without flagging.
    *
    * Scale shape: identical to [[applyDelta]] (one key-shuffle full-outer
    * join, O(|delta keys| + |state|)); the flag bounds the expensive part
    * — recompute — to groups whose extreme was actually hit, which for
    * uniform deletes is a small fraction of touched groups. */
  def applyDeltaRetractable(
      state: DataFrame,
      deltaAgg: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty,
      flagCol: String = "__recompute",
      kmvCols: Seq[(String, Int)] = Seq.empty): DataFrame = {
    require(!((keys ++ Seq("count_rows") ++ sumCols ++ minCols ++ maxCols ++
        kmvCols.map(_._1)).contains(flagCol)),
      s"flagCol '$flagCol' collides with a state column")
    val sCols = keys ++ Seq("count_rows") ++ sumCols ++ minCols ++ maxCols ++
      kmvCols.map(_._1)
    val dCols = keys ++ Seq("count_rows") ++ sumCols ++
      (minCols ++ maxCols ++ kmvCols.map(_._1))
        .flatMap(c => Seq(s"__ins_$c", s"__ret_$c"))
    val s = state.select(sCols.map(col): _*).alias("s")
    val d = deltaAgg.select(dCols.map(col): _*).alias("d")
    val joined = s.join(d,
      keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _), "full_outer")
    // count_rows is never null on either side's present rows, so its
    // nullity IS the presence marker for that side of the join
    val stateAbsent = col("s.count_rows").isNull
    val deltaAbsent = col("d.count_rows").isNull
    // additive merge keys off COLUMN nullity, not side presence: a present
    // delta can still carry a null sum partial (all its changed rows were
    // null-valued — sum ignores them) and must pass the stored sum through
    def add(c: String): Column =
      when(col(s"s.$c").isNull, col(s"d.$c"))
        .when(col(s"d.$c").isNull, col(s"s.$c"))
        .otherwise(col(s"s.$c") + col(s"d.$c")).as(c)
    // state absent → the group is entirely new, __ins covers every row;
    // delta absent → untouched, stored value stands; both present →
    // merge the added side in. Exact except where `uncertain` flags.
    def extreme(c: String, combine: (Column, Column) => Column): Column =
      when(stateAbsent, col(s"d.__ins_$c")).when(deltaAbsent, col(s"s.$c"))
        .otherwise(combine(col(s"s.$c"), col(s"d.__ins_$c"))).as(c)
    // the stored extreme may have been retracted iff a retraction
    // ties-or-beats it (a retracted value strictly beyond the stored
    // extreme is impossible on consistent inputs, but flags — recompute
    // is always safe). A null stored extreme (all-null group) with a
    // non-null retraction is likewise inconsistent → flag.
    // EXEMPTION (provable): if the batch also INSERTS a value that
    // ties-or-beats its best retraction, the merged extreme is exact and
    // no recompute is needed. For min: ins ≤ ret ⇒ min(after) =
    // min((before∖R)∪I) — if the stored min was not retracted this is
    // min(stored, ins) outright; if it WAS retracted then ret = stored
    // (nothing retracted can undercut the stored min), so ins ≤ stored ≤
    // every survivor and min(after) = ins = min(stored, ins) again. Max
    // is symmetric. This is what makes an update that does not move the
    // extreme-holding column (ins = ret, e.g. a row rewritten for an
    // UNRELATED column's change in a shared multi-view feed) — and a
    // min-holder being lowered / max-holder raised — maintenance-exact
    // with zero recompute.
    // A retraction for a group ABSENT from state is only reachable on an
    // inconsistent feed — flag it too (the recompute self-heals) rather
    // than emit the group with __ins-only extremes beside a negative count.
    def uncertain(c: String, beats: (Column, Column) => Column): Column =
      !deltaAbsent && col(s"d.__ret_$c").isNotNull && (stateAbsent ||
        ((col(s"s.$c").isNull || beats(col(s"d.__ret_$c"), col(s"s.$c"))) &&
          !(col(s"d.__ins_$c").isNotNull &&
            beats(col(s"d.__ins_$c"), col(s"d.__ret_$c")))))
    // KMV partials: the stored k-min hash array unions with the batch's
    // insert sketch (k-min of a union = trimmed union of k-mins — exact);
    // a hash can never be REMOVED from a k-min set, so any retraction
    // whose hash sits at or below the stored k-th minimum (array_max of
    // the sorted stored array; an empty/ABSENT store with a retraction is
    // inconsistent and likewise flags) forces the group's recompute. No
    // ins-covers-ret exemption: a re-inserted value may not be the LAST
    // live copy of the retracted one — conservative, never wrong.
    def kmvMerged(c: String, k: Int): Column =
      when(stateAbsent, col(s"d.__ins_$c")).when(deltaAbsent, col(s"s.$c"))
        .otherwise(slice(array_sort(
          array_union(col(s"s.$c"), col(s"d.__ins_$c"))), 1, k)).as(c)
    def kmvUncertain(c: String): Column =
      !deltaAbsent && col(s"d.__ret_$c").isNotNull && (stateAbsent ||
        coalesce(col(s"d.__ret_$c") <= array_max(col(s"s.$c")), lit(true)))
    val flags =
      minCols.map(c => uncertain(c, _ <= _)) ++
        maxCols.map(c => uncertain(c, _ >= _)) ++
        kmvCols.map { case (c, _) => kmvUncertain(c) }
    joined.select(
      keys.map(k => coalesce(col(s"d.$k"), col(s"s.$k")).as(k)) ++
        Seq(add("count_rows")) ++
        sumCols.map(add) ++
        minCols.map(extreme(_, least(_, _))) ++
        maxCols.map(extreme(_, greatest(_, _))) ++
        kmvCols.map { case (c, k) => kmvMerged(c, k) } :+
        flags.reduceOption(_ || _).getOrElse(lit(false)).as(flagCol): _*)
      .filter(col("count_rows") =!= 0)
  }
}

package graft.ops

import java.nio.file.{Files, Path}

import graft.plans.MatView
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Glue between the maintained-aggregate machinery ([[AggMaintain]], the
  * CDF maintainers, the streaming tail consumer) and the transparent
  * query rewrite ([[graft.plans.MatViewRewrite]]): a maintained aggregate
  * table whose commits carry the `_APPLIED_BASE_V` marker (the Delta
  * `txn`-action convention the streaming maintainer already writes)
  * becomes a registered materialized view whose freshness and scan-root
  * match FOLLOW the base's commits — maintain the view, and ad-hoc
  * aggregates re-plan onto it; let it lag, and they fall back to the
  * base, automatically.
  *
  * The reference creates a `datamart` schema but ships no queries for it
  * (/root/reference/dags/configure.py:46-52); this closes that layer the
  * warehouse way: incremental view maintenance + transparent rewrite.
  */
object MatViews {

  /** Marker file inside each maintained-aggregate commit naming the base
    * version its state reflects — shared with the streaming maintainer's
    * exactly-once apply. */
  val AppliedMarker = "_APPLIED_BASE_V"

  /** The base version the view's CURRENT commit reflects, if recorded.
    * A corrupt/garbled marker parses to None — maintenance then
    * re-bootstraps (self-heal) instead of aborting on the damaged file. */
  def appliedBase(view: Path): Option[Long] =
    Storage.currentVersion(view).flatMap { v =>
      val f = view.resolve(s"v$v").resolve(AppliedMarker)
      if (Files.exists(f))
        scala.util.Try(
          new String(Files.readAllBytes(f), "UTF-8").trim.toLong).toOption
      else None
    }

  /** Commit a maintained aggregate state WITH its applied-base marker —
    * atomic (the marker rides inside the version dir), so freshness can
    * never claim a state the commit does not hold. Tiny hot table:
    * the footer-stats pass is skipped, same as the streaming maintainer. */
  def commitMaintained(state: DataFrame, view: Path, appliedBaseV: Long,
      keepVersions: Int = 1): Long =
    Storage.commitVersion(state, view, keepVersions = keepVersions,
      extraFiles = Map(AppliedMarker -> appliedBaseV.toString),
      fileStats = false)

  /** The exact root-path set the base's CURRENT composed read scans —
    * what [[graft.plans.MatViewRewrite]] must see to know the aggregate
    * reads the WHOLE committed state:
    *  - flat versioned table → the version directory;
    *  - partition-manifested table, all buckets owned by one version and
    *    no live deletion vector → every bucket directory;
    *  - anything else (multi-owner composition, DV-masked read — shapes
    *    the rewrite cannot match anyway) → empty, which never matches.
    * Multi-owner states converge to single-owner at the next compaction,
    * so the rewrite resumes with scheduled maintenance. */
  def expectedRoots(base: Path): Set[String] =
    Storage.currentVersion(base) match {
      case None => Set.empty
      case Some(v) =>
        val vdir = base.resolve(s"v$v")
        val manifest = Storage.readPartsManifest(vdir)
        if (manifest.isEmpty) Set(MatView.root(vdir))
        else if (Storage.deletionVector(base).nonEmpty) Set.empty
        else if (manifest.values.toSet.size != 1) Set.empty
        else {
          val owner = base.resolve(s"v${manifest.values.head}")
          manifest.keySet.map(p => MatView.root(owner.resolve(p)))
        }
    }

  /** Register a maintained aggregate table as a transparent materialized
    * view over `base`. Freshness = the view's applied-base marker equals
    * the base's committed version; scan roots follow the base's current
    * composition. Install [[graft.plans.MatViewRewrite]] (session-wide
    * via GraftExtensions or per-query via experimental.extraOptimizations)
    * and matching aggregates re-plan onto the view. */
  def registerRewrite(spark: SparkSession, name: String,
      base: Path, view: Path, keys: Seq[String],
      countCol: Option[String] = Some("count_rows"),
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      where: Option[Column] = None,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty): Unit =
    MatView.register(MatView.Def(
      name = name,
      baseRoots = () => expectedRoots(base),
      view = () => Storage.readVersion(spark, view),
      keys = keys, countCol = countCol, sums = sums, mins = mins, maxs = maxs,
      counts = counts,
      fresh = () => appliedBase(view).exists(a =>
        Storage.currentVersion(base).contains(a)),
      kmvs = kmvs, kmvK = kmvK,
      where = { lazy val w = resolveWhere(spark, base, where); () => w },
      sumsqs = sumsqs, sumcubes = sumcubes, sumquads = sumquads,
      covs = covs))

  /** Resolve a FILTERED view's predicate against the base's schema ONCE,
    * into the conjuncts [[graft.plans.MatViewSupport.consumeWhere]]
    * matches query filters against — resolution through the same analyzer
    * AND optimizer the query goes through is what makes literal
    * promotions, cast folding, and inferred not-null guards line up on
    * both sides (a matched query's filters are read from the OPTIMIZED
    * plan). Invoked LAZILY (memoized `lazy val` in [[registerRewrite]]):
    * registration stays metadata-only, and a filtered view over a base
    * with no committed version yet registers fine — the thunk only runs at
    * the first match attempt, which the root-set check already guarantees
    * happens after the base's first commit. */
  private def resolveWhere(spark: SparkSession, base: Path,
      where: Option[Column]): Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    where.toSeq.flatMap { w =>
      def split(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
          split(l) ++ split(r)
        case x => Seq(x)
      }
      readBase(spark, base).filter(w).queryExecution.optimizedPlan.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          split(f.condition)
      }.getOrElse(Nil)
    }

  /** Outcome of one [[maintain]] call: the base version the view now
    * reflects, the view commit that holds it, and how many groups needed
    * a min/max recompute (0 on the pure-additive fast path). */
  final case class MaintainResult(
      appliedBase: Long, viewVersion: Long, recomputedGroups: Long)

  /** One aggregate view over a shared base, for [[maintainAll]]:
    * `sums`/`mins`/`maxs`/`counts` map base column → view partial column
    * (`counts` = non-null counts, serving COUNT(col) and AVG). */
  final case class ViewSpec(
      view: Path,
      keys: Seq[String],
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      keepVersions: Int = 1,
      maxCollectedGroups: Int = 10000,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      filter: Option[Column] = None,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty) {
    private[MatViews] def aggCols: Seq[String] =
      (sums.keys ++ mins.keys ++ maxs.keys ++ counts.keys ++ kmvs.keys ++
        sumsqs.keys ++ sumcubes.keys ++ sumquads.keys ++
        covs.values.flatMap { case (a, b) => Seq(a, b) }).toSeq.distinct
    private[MatViews] def compareCols(pk: Seq[String]): Seq[String] = {
      val cc = (keys ++ aggCols).distinct.filterNot(pk.contains)
      require(cc.nonEmpty,
        s"every grouping/aggregated column of $view is a pk column — nothing to diff")
      cc
    }
    private[MatViews] def applyFilter(df: DataFrame): DataFrame =
      filter.fold(df)(df.filter)
  }

  /** Column names a star predicate references, resolved by ONE analysis
    * of the predicate over the stacked side schemas (a limit-0 cross join
    * — analyzed, never executed). Star predicates address columns by
    * globally-unique bare name (the star contract), so resolution is
    * unambiguous even though bookkeeping columns may collide. */
  private def starFilterRefs(sideReads: Seq[DataFrame], f: Column): Seq[String] = {
    val stacked = sideReads.map(_.limit(0)).reduce(_ crossJoin _)
    stacked.filter(f).queryExecution.analyzed.collectFirst {
      case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        fl.condition.references.map(_.name).toSeq.distinct
    }.getOrElse(Nil)
  }

  /** Column names a (non-boolean) expression references over one side's
    * schema — same one-analysis trick as [[starFilterRefs]], via a
    * limit-0 projection. */
  private def exprRefs(sideRead: DataFrame, c: Column): Seq[String] =
    sideRead.limit(0).select(c).queryExecution.analyzed.collectFirst {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.flatMap(_.references.map(_.name)).distinct
    }.getOrElse(Nil)

  private def readBase(spark: SparkSession, base: Path): DataFrame = {
    val v = Storage.currentVersion(base).getOrElse(
      throw new IllegalStateException(s"no committed version at $base"))
    readBaseAt(spark, base, v)
  }

  /** Read the base AT a pinned version — every bootstrap/recompute path
    * must use this with the version captured up front, never a read that
    * re-resolves the current version: a base that commits mid-call would
    * otherwise leave the view's STATE one version ahead of its MARKER,
    * and the next roll-forward would double-apply that interval's feed. */
  private def readBaseAt(spark: SparkSession, base: Path, v: Long): DataFrame =
    if (Files.exists(base.resolve(s"v$v").resolve("_PARTS.json")))
      Storage.readPartitionedVersionAt(spark, base, v)
    else Storage.readVersionAt(spark, base, v)

  /** One-call incremental maintenance of an aggregate view over a
    * versioned base table — the full IVM loop that [[registerRewrite]]
    * serves: bring `view` (keys ++ count_rows ++ sum/min/max partials)
    * from the base version its marker records to the base's CURRENT
    * version using the change feed alone, and commit the new state with
    * the advanced marker. First call (no marker) bootstraps with one full
    * aggregate.
    *
    * Counts and sums roll forward as signed partials
    * ([[AggMaintain.retractableDeltaAggregates]]); min/max — not
    * invertible under retraction — are merged where safe and recomputed
    * ONLY for groups whose stored extreme a retraction tied-or-beat
    * ([[AggMaintain.applyDeltaRetractable]]'s flag). The recompute scan
    * reads the base ONCE for all flagged groups, stats-pruned
    * ([[MetaAgg.readPrunedWhere]]) to the flagged keys' value ranges and
    * filtered to their exact key set when the set is driver-collectable
    * (≤ `maxCollectedGroups` — bounded by touched groups, never by data);
    * beyond that it degrades to one full re-aggregate — the bootstrap
    * cost, never more.
    *
    * Contract: single maintainer per view (concurrent base commits are
    * fine — a base that advances mid-call simply leaves the view one
    * version behind, and freshness keeps rewrites honest until the next
    * call); `sums`/`mins`/`maxs`/`counts` (non-null counts, serving
    * COUNT(col) and AVG) map base column → view partial column,
    * and the view's partial types must match what the base columns
    * aggregate to (true automatically when the bootstrap path wrote the
    * view). At 100 TB the per-call cost is O(changed buckets + |touched
    * groups|) — the CDF is manifest/DV-diff pruned — plus the flagged
    * recompute, which uniform deletes keep to a sliver of touched groups.
    */
  def maintain(
      spark: SparkSession,
      base: Path,
      view: Path,
      pk: Seq[String],
      keys: Seq[String],
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      keepVersions: Int = 1,
      maxCollectedGroups: Int = 10000,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      filter: Option[Column] = None,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty): MaintainResult =
    maintainAll(spark, base, pk, Seq(ViewSpec(view, keys, sums, mins, maxs,
      counts, keepVersions, maxCollectedGroups, kmvs, kmvK, filter,
      sumsqs, sumcubes, sumquads, covs))).head

  /** [[maintain]] for EVERY aggregate view of one base in a single call —
    * the shape scheduled maintenance should use. The 100 TB win is feed
    * sharing: views lagging at the SAME base version share ONE change
    * feed over the union of their compared columns (one changed-bucket
    * scan + one pk join, materialized once), instead of N; each view then
    * runs only its own view-sized delta-aggregate + merge. A row the
    * shared feed emits for an unrelated view's column is harmless to the
    * others: its pre/post values for their columns are identical, so
    * counts and sums cancel exactly and min/max fall under
    * [[AggMaintain.applyDeltaRetractable]]'s ins-ties-ret exemption —
    * zero spurious recomputes. Bootstrapping views (no marker yet)
    * deliberately do NOT share a cached base read: each bootstrap scan is
    * column-pruned to its own needs, which at 100 TB beats materializing
    * the unpruned base once. */
  def maintainAll(
      spark: SparkSession,
      base: Path,
      pk: Seq[String],
      specs: Seq[ViewSpec]): Seq[MaintainResult] = {
    require(specs.nonEmpty, "maintainAll needs at least one view spec")
    val to = Storage.currentVersion(base).getOrElse(
      throw new IllegalStateException(s"no committed version at $base"))
    val states = specs.map(sp => sp -> appliedBase(sp.view))
    // a lagging view can roll INCREMENTALLY only when both interval
    // endpoints still carry partition manifests; a flat commitVersion
    // base (full rewrites — the Workspace.commitAll shape) or a marker
    // that aged past the base's retention re-BOOTSTRAPS instead — the
    // full-aggregate cost, proportional to a base that was itself just
    // fully rewritten, and the self-heal for consumers that lag too far
    def feedable(f: Long): Boolean =
      Storage.partitionManifestRetained(base, f) &&
        Storage.partitionManifestRetained(base, to)
    // a FILTERED view's predicate columns must ride the change feed too:
    // a row crossing the filter boundary must surface as an insert/delete
    // of the view. The refs come from ONE analysis of the predicate over
    // the base's schema — the same resolution the maintenance filter and
    // the rewrite matcher go through. The base read is built ONCE and
    // shared across every filtered spec of this call (its construction
    // lists the version's manifest — per-spec rebuilds would put that on
    // the hot maintenance path for nothing).
    lazy val baseForRefs = readBaseAt(spark, base, to)
    def filterRefsOf(sp: ViewSpec): Seq[String] =
      sp.filter.toSeq.flatMap { f =>
        baseForRefs.filter(f).queryExecution.analyzed
          .collectFirst {
            case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              fl.condition.references.map(_.name).toSeq
          }.getOrElse(Nil)
      }
    val feeds: Map[Long, DataFrame] = states
      .collect { case (sp, Some(f)) if f != to && feedable(f) => (sp, f) }
      .groupBy(_._2)
      .map { case (f, grp) =>
        val cols = grp.flatMap { case (sp, _) =>
          sp.compareCols(pk) ++ filterRefsOf(sp).filterNot(pk.contains)
        }.distinct
        val cdf = Cdc.changeDataFeed(spark, base, f, to, pk, cols,
          preImages = true)
        // materialize only when actually shared — a lone view reads once
        f -> (if (grp.sizeIs > 1) cdf.localCheckpoint() else cdf)
      }
    states.map {
      case (sp, None) =>
        MaintainResult(to,
          commitMaintained(bootstrapState(spark, base, sp, to), sp.view, to,
            sp.keepVersions), 0)
      case (sp, Some(f)) if f == to =>
        MaintainResult(to, Storage.currentVersion(sp.view).get, 0)
      case (sp, Some(f)) if feedable(f) =>
        rollForward(spark, base, sp, feeds(f), to)
      case (sp, Some(_)) =>
        MaintainResult(to,
          commitMaintained(bootstrapState(spark, base, sp, to), sp.view, to,
            sp.keepVersions), 0)
    }
  }

  // bootstraps from the PINNED version captured by maintainAll — a base
  // that commits mid-call must not leave the state ahead of the marker
  private def bootstrapState(spark: SparkSession, base: Path,
      sp: ViewSpec, to: Long): DataFrame = {
    val aggs = sp.sums.map { case (b, v) => sum(col(b)).as(v) } ++
      sp.mins.map { case (b, v) => min(col(b)).as(v) } ++
      sp.maxs.map { case (b, v) => max(col(b)).as(v) } ++
      sp.counts.map { case (b, v) => count(col(b)).as(v) } ++
      sp.sumsqs.map { case (b, v) => sum(powCol(b, 2)).as(v) } ++
      sp.sumcubes.map { case (b, v) => sum(powCol(b, 3)).as(v) } ++
      sp.sumquads.map { case (b, v) => sum(powCol(b, 4)).as(v) } ++
      covsAsSums(sp.covs).map { case (v, c) => sum(c).as(v) } ++
      sp.kmvs.map { case (b, v) =>
        graft.plans.KmvSketch.partialCol(col(b), sp.kmvK).as(v) }
    sp.applyFilter(readBaseAt(spark, base, to)).groupBy(sp.keys.map(col): _*)
      .agg(count(lit(1)).as("count_rows"), aggs.toSeq: _*)
  }

  /** A per-column NON-NULL count (COUNT(x) / the AVG denominator) is
    * just a sum of 0/1 indicators — fully additive under retraction, so
    * it rides the signed-sum path end to end and never flags a
    * recompute. */
  private def countsAsSums(counts: Map[String, String]): Map[String, Column] =
    counts.map { case (b, v) => v -> when(col(b).isNotNull, 1L).otherwise(0L) }

  /** A power-sum partial's per-row term Σxᵏ, in the DOUBLE domain the
    * serving formulas ([[graft.plans.MatViewSupport.momentsOnto]]) divide
    * in — the same cast-to-double the moment family's analyzed child
    * carries. A null x yields a null term, which sum skips: the moments
    * count only non-null values, exactly the `counts` partial's n. Signed
    * and purely additive under retraction, like any sum — deletes
    * subtract the exact stored pre-image term, so power sums never flag a
    * recompute. */
  private def powCol(b: String, k: Int): Column = {
    val d = col(b).cast("double")
    Iterator.fill(k - 1)(d).foldLeft(d)(_ * _)
  }

  /** Power-sum partials ride the signed-sum path of the delta
    * aggregates. */
  private def powsAsSums(m: Map[String, String], k: Int): Map[String, Column] =
    m.map { case (b, v) => v -> powCol(b, k) }

  /** The six PAIRWISE-COMPLETE sum terms one `covs` pair maintains
    * (view column → per-row term), named by the shared convention
    * ([[graft.plans.MatViewSupport.covCols]]). Every term is gated on
    * BOTH inputs being non-null — exactly the rows Spark's Covariance/
    * PearsonCorrelation update consumes — and is a plain signed sum, so
    * the whole set rides the additive path and never flags a recompute. */
  private def covsAsSums(covs: Map[String, (String, String)]): Map[String, Column] =
    covs.flatMap { case (p, (x, y)) =>
      val both = col(x).isNotNull && col(y).isNotNull
      val xd = col(x).cast("double")
      val yd = col(y).cast("double")
      val Seq(cn, csx, csy, csxx, csyy, csxy) =
        graft.plans.MatViewSupport.covCols(p)
      Seq(
        cn -> when(both, 1L).otherwise(0L),
        csx -> when(both, xd), csy -> when(both, yd),
        csxx -> when(both, xd * xd), csyy -> when(both, yd * yd),
        csxy -> when(both, xd * yd))
    }

  /** The retractable merge both maintainers share: apply the delta, count
    * the groups whose stored extreme may have been retracted, and — only
    * if there are any — overwrite those groups' min/max from
    * `recompute(flaggedKeys, n)` (a frame of keys ++ exact extremes over
    * the CURRENT state; how it prunes is the caller's shape: a
    * stats-pruned single-table scan, or a filtered re-join). Returns the
    * next state and the flagged-group count. */
  private def mergeRetractable(
      state: DataFrame, deltaAgg: DataFrame, keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String], maxCols: Seq[String],
      recompute: (DataFrame, Long) => DataFrame,
      kmvCols: Seq[(String, Int)] = Seq.empty): (DataFrame, Long) = {
    val flag = "__recompute"
    // PURE-SUMS views (no min/max/KMV partial anywhere — the whole
    // statistical family, distribution views, join-count views) can never
    // flag a recompute: applyDeltaRetractable's flag column is literally
    // `false` with no extreme registered. The checkpoint exists only
    // because the merged state is read twice (flag count + final commit)
    // — with nothing to flag there is exactly ONE read (the commit), so
    // both the materialization job and the flag-count job are pure
    // overhead: skip straight to the merge pipeline (guide §1.2 step 1 —
    // two fewer view-sized passes per refresh at any scale).
    if (minCols.isEmpty && maxCols.isEmpty && kmvCols.isEmpty)
      return (AggMaintain.applyDeltaRetractable(
        state, deltaAgg, keys, sumCols, Nil, Nil, flag).drop(flag), 0L)
    // checkpointed: the merged state is read twice (flag count +
    // final commit) and feeds a join — view-sized, not base-sized
    val merged = Prof.time("matViews.merge.checkpoint")(
      AggMaintain.applyDeltaRetractable(
        state, deltaAgg, keys, sumCols, minCols, maxCols, flag, kmvCols)
        .localCheckpoint())
    val flagged = merged.filter(col(flag))
    val n = Prof.time("matViews.merge.flagCount")(flagged.count())
    val next =
      if (n == 0) merged.drop(flag)
      else {
        val rec = recompute(flagged.select(keys.map(col): _*), n)
        val m = merged.alias("m")
        val r = rec.alias("r")
        val joined = m.join(r,
          keys.map(k => col(s"m.$k") <=> col(s"r.$k")).reduce(_ && _), "left")
        joined.select(
          keys.map(k => col(s"m.$k").as(k)) ++
            Seq(col("m.count_rows").as("count_rows")) ++
            sumCols.map(c => col(s"m.$c").as(c)) ++
            (minCols ++ maxCols ++ kmvCols.map(_._1)).map(c =>
              when(col(s"m.$flag"), col(s"r.$c"))
                .otherwise(col(s"m.$c")).as(c)): _*)
      }
    (next, n)
  }

  private def rollForward(spark: SparkSession, base: Path, sp: ViewSpec,
      cdf0: DataFrame, to: Long): MaintainResult = {
    val keys = sp.keys
    // filtered view: the predicate applies PER IMAGE ROW, which is exactly
    // the transition semantics — a pre-image outside the filter was never
    // in the view (nothing to retract), a post-image inside it is a plain
    // insert, so boundary crossings reduce to one-sided feed rows
    val cdf = sp.applyFilter(cdf0)
    val deltaAgg = AggMaintain.retractableDeltaAggregates(cdf, keys,
      sp.sums.map { case (b, v) => v -> col(b) } ++ countsAsSums(sp.counts) ++
        powsAsSums(sp.sumsqs, 2) ++ powsAsSums(sp.sumcubes, 3) ++
        powsAsSums(sp.sumquads, 4) ++ covsAsSums(sp.covs),
      sp.mins.map { case (b, v) => v -> col(b) },
      sp.maxs.map { case (b, v) => v -> col(b) },
      kmvs = sp.kmvs.map { case (b, v) => v -> (col(b), sp.kmvK) })
    val (next, n) = mergeRetractable(
      Storage.readVersion(spark, sp.view), deltaAgg, keys,
      (sp.sums.values ++ sp.counts.values ++ sp.sumsqs.values ++
        sp.sumcubes.values ++ sp.sumquads.values ++
        sp.covs.keys.flatMap(graft.plans.MatViewSupport.covCols)).toSeq,
      sp.mins.values.toSeq, sp.maxs.values.toSeq,
      (flaggedKeys, n0) => recomputeExtremes(spark, base, to, keys, sp.mins,
        sp.maxs, flaggedKeys, n0, sp.maxCollectedGroups, sp.kmvs, sp.kmvK,
        sp.filter),
      kmvCols = sp.kmvs.values.map(v => v -> sp.kmvK).toSeq)
    MaintainResult(to, commitMaintained(next, sp.view, to, sp.keepVersions), n)
  }

  /** Marker file inside each maintained JOIN/STAR-view commit naming the
    * TUPLE of base versions its state reflects, as "v1,v2[,…]" in side
    * order. */
  val AppliedBasesMarker = "_APPLIED_BASES_V"

  /** The base versions (one per side, in side order) the join/star view's
    * CURRENT commit reflects, if recorded. A corrupt/garbled marker parses
    * to None — maintenance re-bootstraps instead of aborting. */
  def appliedVersions(view: Path): Option[Seq[Long]] =
    Storage.currentVersion(view).flatMap { v =>
      val f = view.resolve(s"v$v").resolve(AppliedBasesMarker)
      if (!Files.exists(f)) None
      else scala.util.Try(new String(Files.readAllBytes(f), "UTF-8")
        .trim.split(",").toSeq.map(_.toLong)).toOption
    }

  /** The (left, right) base versions of a TWO-side join view, if
    * recorded — the [[appliedVersions]] pair form. */
  def appliedBases(view: Path): Option[(Long, Long)] =
    appliedVersions(view).collect { case Seq(a, b) => (a, b) }

  /** Outcome of one [[maintainJoin]] call: the base-version pair the view
    * now reflects, the view commit holding it, and how many groups needed
    * a min/max re-join recompute (0 on the pure-additive path). */
  final case class MaintainJoinResult(
      appliedLeft: Long, appliedRight: Long, viewVersion: Long,
      recomputedGroups: Long = 0)

  /** Incremental maintenance of an aggregate view over the INNER
    * EQUI-JOIN of two versioned bases — the loop
    * [[graft.plans.MatViewJoinRewrite]] serves. Brings `view` (keys ++
    * count_rows ++ sum/count partials) from the base-version PAIR its
    * marker records to both bases' CURRENT versions using their change
    * feeds and the delta-join rule ([[ViewMaintain.joinDelta]]:
    * Δ(A⋈B) = ΔA⋈B₁ ∪ A₀⋈ΔB — each term joins one small feed against one
    * base, feed side broadcast, so neither base shuffles), then one
    * view-sized signed merge ([[AggMaintain.applyDelta]]). First call
    * bootstraps with one full join + aggregate.
    *
    * COUNT(*) / SUM / non-null COUNT partials are self-maintainable
    * (signed, purely additive). MIN/MAX ride the same retractable
    * machinery as [[maintain]]: merged where provably exact
    * ([[AggMaintain.applyDeltaRetractable]]'s ins-ties-ret exemption
    * covers rows re-bucketed for an unrelated change), and recomputed
    * ONLY for flagged groups by ONE re-join of the current snapshots
    * filtered to the flagged key set when it is driver-collectable
    * (≤ `maxCollectedGroups`; the key predicate pushes below the join
    * into the side that carries it), degrading past the budget to one
    * full re-join — the bootstrap cost, never more.
    *
    * `sums`/`counts` map a base column (of EITHER side — names must be
    * disjoint across sides) → view partial column. `joinKeysLeft`/
    * `joinKeysRight` are the positionally-paired equi-join columns.
    * Roll-forward requires partition-manifested bases (the change feed is
    * manifest-diff pruned); bootstrap accepts any versioned layout.
    * Contract mirrors [[maintain]]: single maintainer per view;
    * concurrent base commits leave the view one step behind, freshness
    * keeps rewrites honest. */
  def maintainJoin(
      spark: SparkSession,
      left: Path,
      right: Path,
      view: Path,
      pkLeft: Seq[String],
      pkRight: Seq[String],
      joinKeysLeft: Seq[String],
      joinKeysRight: Seq[String],
      keys: Seq[String],
      sums: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      keepVersions: Int = 1,
      maxCollectedGroups: Int = 10000,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty): MaintainJoinResult = {
    require(joinKeysLeft.size == joinKeysRight.size && joinKeysLeft.nonEmpty,
      "joinKeysLeft/joinKeysRight must pair up")
    val r = maintainStar(spark,
      Seq(StarSide(left, pkLeft), StarSide(right, pkRight)), view,
      joinKeys = joinKeysLeft.zip(joinKeysRight), keys = keys,
      sums = sums, counts = counts, mins = mins, maxs = maxs,
      keepVersions = keepVersions, maxCollectedGroups = maxCollectedGroups,
      sumsqs = sumsqs, sumcubes = sumcubes, sumquads = sumquads, covs = covs)
    MaintainJoinResult(r.applied.head, r.applied(1), r.viewVersion,
      r.recomputedGroups)
  }

  /** One side of a star view: its table and primary key (the change-feed
    * row identity). `derive` adds DETERMINISTIC computed columns to the
    * side before joining — snapshots and delta feeds alike — so join keys
    * can be synthesized expressions rather than stored columns. The
    * canonical use is the reference's unknown-member join
    * (/root/reference/dags/dwh_fact_charer_location.py:107-112, rewritten
    * to an equi-key per [[Facts.unknownMemberKey]]): the fact derives
    * `coalesce(url, SENTINEL)`, the dim derives
    * `IF(id = -1, SENTINEL, url)`, and the star joins the derived pair —
    * a hash join at any scale, maintained like any other edge (a derived
    * key is a pure per-row function, so it is correct on pre- and
    * post-images both). Derived names must not collide with stored
    * columns and are globally unique like all star columns. */
  final case class StarSide(table: Path, pk: Seq[String],
      derive: Seq[(String, Column)] = Nil)

  /** Outcome of one [[maintainStar]] call: the base versions (side order)
    * the view now reflects, the view commit holding it, and how many
    * groups needed a min/max re-join recompute. */
  final case class MaintainStarResult(
      applied: Seq[Long], viewVersion: Long, recomputedGroups: Long = 0)

  /** Incremental maintenance of an aggregate view over the N-ary INNER
    * EQUI-JOIN of versioned bases — the fact ⋈ dim₁ ⋈ … ⋈ dimₖ star the
    * reference's richest fact resolves in one load
    * (/root/reference/dags/dwh_fact_charer_location.py:103-115) and
    * [[graft.plans.MatViewJoinRewrite]] navigates. Brings `view` (keys ++
    * count_rows ++ partials) from the base-version TUPLE its marker
    * records to every side's CURRENT version by the generalized delta
    * rule ([[ViewMaintain.starDelta]]: one term per changed side, each a
    * broadcast feed probing the other sides — earlier sides OLD, later
    * sides NEW — so no base ⋈ base shuffle ever forms), then one
    * view-sized signed merge. First call bootstraps with one full join +
    * aggregate.
    *
    * `joinKeys` pair equi-join columns by GLOBAL name (each name must
    * belong to exactly one side; the pair graph must connect all sides).
    * COUNT(*) / SUM / non-null COUNT partials are self-maintainable;
    * MIN/MAX — and `kmvs` sketch partials (the k-min hash arrays serving
    * approx COUNT(DISTINCT) navigation, exactly as on the single-base
    * path) — ride the retractable machinery: merged where provably exact,
    * recomputed for flagged groups by ONE re-join of the current
    * snapshots filtered to the flagged key set when driver-collectable
    * (≤ `maxCollectedGroups`), degrading past the budget to one full
    * re-join — the bootstrap cost, never more.
    *
    * `filter` is an optional POST-JOIN predicate (a FILTERED star view —
    * the last-quarter slice of a fact⋈dim rollup): the view aggregates
    * only joined rows satisfying it. Maintenance applies it PER IMAGE ROW
    * of the joined delta — exactly the transition semantics the
    * single-base filtered path uses: a pre-image outside the slice was
    * never in the view (its retraction filters away), a post-image inside
    * it is a plain insert, so boundary crossings reduce to one-sided
    * delta rows. Its column references (bare, globally-unique side column
    * names) ride the change feeds automatically.
    *
    * Contract mirrors [[maintain]]: single maintainer per view; roll-
    * forward needs partition-manifested sides (the feeds are manifest-
    * diff pruned) while bootstrap accepts any versioned layout; every
    * read is PINNED to the versions captured up front, so concurrent base
    * commits just leave the view one step behind and freshness keeps
    * rewrites honest. At 100 TB the per-call cost is O(Σ|Δᵢ| × join
    * fan-out + touched groups), never a table scan. */
  def maintainStar(
      spark: SparkSession,
      sides: Seq[StarSide],
      view: Path,
      joinKeys: Seq[(String, String)],
      keys: Seq[String],
      sums: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      keepVersions: Int = 1,
      maxCollectedGroups: Int = 10000,
      filter: Option[Column] = None,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty): MaintainStarResult = {
    require(sides.size >= 2, "maintainStar needs at least two sides")
    require(joinKeys.nonEmpty, "joinKeys must be non-empty")
    val tos = sides.map(s => Storage.currentVersion(s.table).getOrElse(
      throw new IllegalStateException(s"no committed version at ${s.table}")))
    // cov pair columns may span sides (fact measure × dim attribute):
    // the terms evaluate over joined image rows, so each side only needs
    // to CARRY its own column
    val aggBase = (sums.keys ++ counts.keys ++ mins.keys ++ maxs.keys ++
      kmvs.keys ++ sumsqs.keys ++ sumcubes.keys ++ sumquads.keys ++
      covs.values.flatMap { case (a, b) => Seq(a, b) })
      .toSeq.distinct
    val jkNames = joinKeys.flatMap { case (a, b) => Seq(a, b) }.distinct
    // pinned schema resolution — same race discipline as readBaseAt's doc
    val sideReads = sides.zip(tos).map { case (s, v) =>
      readBaseAt(spark, s.table, v) }
    val allPerSide = sideReads.map(_.columns.toSeq)
    // derived join columns: computed per image row on snapshots and feeds
    // alike (deterministic by contract), so a synthesized key maintains
    // exactly like a stored one
    def withDerives(df: DataFrame, s: StarSide): DataFrame =
      s.derive.foldLeft(df) { case (d0, (n, c)) => d0.withColumn(n, c) }
    val derivedPerSide = sides.map(_.derive.map(_._1))
    sides.zip(allPerSide).foreach { case (s, all) =>
      s.derive.foreach { case (n, _) => require(!all.contains(n),
        s"derived column '$n' collides with a stored column of ${s.table}") } }
    val deriveRefsPerSide = sides.zip(sideReads).map { case (s, df) =>
      s.derive.flatMap(d => exprRefs(df, d._2)).distinct }
    // filters may reference stored AND derived columns of any side
    val effReads = sides.zip(sideReads).map { case (s, df) => withDerives(df, s) }
    val filterRefs = filter.toSeq.flatMap(starFilterRefs(effReads, _))
    val used = allPerSide.lazyZip(deriveRefsPerSide).lazyZip(derivedPerSide)
      .toSeq.map { case (all, dRefs, dNames) =>
        (((keys ++ aggBase).filter(all.contains) ++
          (jkNames ++ filterRefs ++ dRefs).filter(all.contains)).distinct,
          dNames)
      }.map { case (stored, dNames) => stored ++ dNames }
    filterRefs.foreach(r => require(used.exists(_.contains(r)),
      s"filter column '$r' is not a column of any side"))
    def applyF(df: DataFrame): DataFrame = filter.fold(df)(df.filter)
    // only the columns the view USES must be side-unambiguous — storage
    // bookkeeping columns (pbucket, load timestamps) may collide freely
    val shared = used.flatten.groupBy(identity).collect {
      case (c, occ) if occ.sizeIs > 1 => c }
    require(shared.isEmpty,
      s"star-view columns must be side-unambiguous (shared: $shared)")
    jkNames.foreach(k => require(used.exists(_.contains(k)),
      s"join key '$k' is not a column of any side"))
    def commit(state: DataFrame): Long =
      Storage.commitVersion(state, view, keepVersions = keepVersions,
        extraFiles = Map(AppliedBasesMarker -> tos.mkString(",")),
        fileStats = false)
    def snapsAt(vs: Seq[Long]): Seq[DataFrame] =
      sides.zip(vs).zip(used).map { case ((s, v), cols) =>
        withDerives(readBaseAt(spark, s.table, v), s).select(cols.map(col): _*) }
    def joinedAll(snaps: Seq[DataFrame]): DataFrame =
      applyF(ViewMaintain.joinConnected(snaps.head, snaps.tail, joinKeys))
    def agged(flat: DataFrame): DataFrame = {
      val aggs = sums.map { case (b, v) => sum(col(b)).as(v) } ++
        counts.map { case (b, v) => count(col(b)).as(v) } ++
        mins.map { case (b, v) => min(col(b)).as(v) } ++
        maxs.map { case (b, v) => max(col(b)).as(v) } ++
        sumsqs.map { case (b, v) => sum(powCol(b, 2)).as(v) } ++
        sumcubes.map { case (b, v) => sum(powCol(b, 3)).as(v) } ++
        sumquads.map { case (b, v) => sum(powCol(b, 4)).as(v) } ++
        covsAsSums(covs).map { case (v, c) => sum(c).as(v) } ++
        kmvs.map { case (b, v) =>
          graft.plans.KmvSketch.partialCol(col(b), kmvK).as(v) }
      flat.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("count_rows"), aggs.toSeq: _*)
    }
    appliedVersions(view) match {
      case Some(fas) if fas == tos =>
        MaintainStarResult(tos, Storage.currentVersion(view).get)
      case Some(fas) if fas.size == sides.size &&
          sides.lazyZip(fas).lazyZip(tos).forall { (s, fa, to1) =>
            fa == to1 || (Storage.partitionManifestRetained(s.table, fa) &&
              Storage.partitionManifestRetained(s.table, to1)) } =>
        val deltas = sides.lazyZip(fas).lazyZip(tos).lazyZip(allPerSide).toSeq
          .zip(used).map { case ((s, fa, to, all), cols) =>
            if (fa == to) None
            else Some(withDerives(
                ViewMaintain.signed(Cdc.changeDataFeed(spark, s.table,
                  fa, to, s.pk, all.filterNot(s.pk.contains),
                  preImages = true)), s)
              .select((cols :+ "sign").map(col): _*))
          }
        val dSides = snapsAt(fas).lazyZip(snapsAt(tos)).lazyZip(deltas).toSeq
          .map { case (o, n, d) => ViewMaintain.DeltaSide(o, n, d) }
        // a FILTERED view's predicate applies per joined IMAGE ROW —
        // transition semantics: crossings reduce to one-sided delta rows
        val viewDelta = applyF(ViewMaintain.starDelta(dSides, joinKeys))
        // CANCEL to net multiplicities per row-tuple before aggregating:
        // distinct delta terms can emit the same joined row with opposite
        // signs (a fact row re-pointed in the same interval its dim row
        // moved — the transient cross term), and a phantom ± pair at an
        // extreme value would bait applyDeltaRetractable's ins-ties-ret
        // exemption into keeping an extreme no surviving row holds. After
        // canceling, net > 0 proves the row exists in the after-state and
        // net < 0 that it existed before — the premises the exemption's
        // proof needs. One delta-sized shuffle; counts/sums scale by |net|.
        //
        // PURE-SUMS star views skip the cancel outright (guide §2.4):
        // counts/sums/power-sums/cov terms are LINEAR in the signed rows,
        // so Σ sign·x over raw term rows equals Σ net·x over canceled
        // ones — the phantom-pair hazard only exists for the min/max/KMV
        // exemption proofs. Dropping it removes a full delta-sized
        // shuffle (grouping by EVERY view column) from each refresh.
        val needCancel = mins.nonEmpty || maxs.nonEmpty || kmvs.nonEmpty
        val sumTerms =
          sums.map { case (b, v) => v -> col(b) } ++ countsAsSums(counts) ++
            powsAsSums(sumsqs, 2) ++ powsAsSums(sumcubes, 3) ++
            powsAsSums(sumquads, 4) ++ covsAsSums(covs)
        val deltaAgg = if (!needCancel)
          AggMaintain.retractableDeltaAggregates(viewDelta, keys, sumTerms,
            changeType = when(col("sign") > 0, lit("insert"))
              .otherwise(lit("delete")),
            weight = abs(col("sign")))
        else {
        val rowCols = viewDelta.columns.filterNot(_ == "sign").toSeq
        val canceled = viewDelta.groupBy(rowCols.map(col): _*)
          .agg(sum(col("sign")).as("__net")).filter(col("__net") =!= 0)
        AggMaintain.retractableDeltaAggregates(canceled, keys, sumTerms,
          mins.map { case (b, v) => v -> col(b) },
          maxs.map { case (b, v) => v -> col(b) },
          changeType = when(col("__net") > 0, lit("insert"))
            .otherwise(lit("delete")),
          weight = abs(col("__net")),
          // KMV ignores multiplicity (a sketch is over DISTINCT values):
          // net > 0 proves the value exists after — its hash may enter the
          // sketch; net < 0 proves copies left — conservative recompute
          // flagging via the smallest retracted hash, same as single-base
          kmvs = kmvs.map { case (b, v) => v -> (col(b), kmvK) })
        }
        // flagged extremes recompute by ONE re-join of the CURRENT
        // snapshots, filtered to the flagged key set (the predicate
        // pushes below the joins into whichever side carries each key)
        def recomputeJoin(flaggedKeys: DataFrame, n: Long): DataFrame = {
          val full = joinedAll(snapsAt(tos))
          val scan =
            if (n > maxCollectedGroups) full
            else {
              val rows = flaggedKeys.collect()
              val pred = keys.zipWithIndex.map { case (k, i) =>
                val vs = rows.map(_.get(i)).toSeq
                val nn = vs.filter(_ != null).distinct
                val base0 = if (nn.isEmpty) lit(false) else col(k).isin(nn: _*)
                if (vs.contains(null)) base0 || col(k).isNull else base0
              }.reduce(_ && _)
              full.filter(pred)
            }
          val aggs = mins.map { case (b, v) => min(col(b)).as(v) } ++
            maxs.map { case (b, v) => max(col(b)).as(v) } ++
            kmvs.map { case (b, v) =>
              graft.plans.KmvSketch.partialCol(col(b), kmvK).as(v) }
          scan.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail.toSeq: _*)
        }
        val (next, n) = mergeRetractable(
          Storage.readVersion(spark, view), deltaAgg, keys,
          (sums.values ++ counts.values ++ sumsqs.values ++
            sumcubes.values ++ sumquads.values ++
            covs.keys.flatMap(graft.plans.MatViewSupport.covCols)).toSeq,
          mins.values.toSeq, maxs.values.toSeq, recomputeJoin,
          kmvCols = kmvs.values.map(v => v -> kmvK).toSeq)
        MaintainStarResult(tos, commit(next), n)
      case _ =>
        // first call, a marker from a different side list, a flat
        // (commitVersion full-rewrite) side, or a marker past a side's
        // retention: one full join + aggregate re-bootstraps the state —
        // the same self-heal shape as [[maintainAll]]'s
        MaintainStarResult(tos, commit(agged(joinedAll(snapsAt(tos)))))
    }
  }

  /** Register a maintained join-aggregate table as a transparent
    * materialized view over `left ⋈ right` — the [[maintainJoin]]
    * counterpart of [[registerRewrite]]: freshness = the view's
    * applied-bases marker equals BOTH bases' committed versions; each
    * side's scan roots follow that base's current composition. */
  def registerJoinRewrite(spark: SparkSession, name: String,
      left: Path, right: Path, view: Path,
      joinKeys: Seq[(String, String)], keys: Seq[String],
      countCol: Option[String] = Some("count_rows"),
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty): Unit =
    registerStarRewrite(spark, name, Seq(left, right), view, joinKeys,
      keys, countCol, sums, mins, maxs, counts, sumsqs = sumsqs,
      sumcubes = sumcubes, sumquads = sumquads, covs = covs)

  /** Register a maintained N-ary star-aggregate table as a transparent
    * materialized view over `tables.head ⋈ … ⋈ tables.last` — the
    * [[maintainStar]] counterpart of [[registerRewrite]]: freshness = the
    * view's applied-versions marker equals EVERY side's committed
    * version (side order is the marker's order, so pass `tables` in the
    * same order maintenance uses); each side's scan roots follow that
    * base's current composition. */
  def registerStarRewrite(spark: SparkSession, name: String,
      tables: Seq[Path], view: Path,
      joinKeys: Seq[(String, String)], keys: Seq[String],
      countCol: Option[String] = Some("count_rows"),
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      where: Option[Column] = None,
      derives: Seq[Seq[(String, Column)]] = Seq.empty,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty): Unit = {
    require(derives.isEmpty || derives.size == tables.size,
      "derives must be empty or parallel to tables (one list per side)")
    val padded =
      if (derives.isEmpty) tables.map(_ => Seq.empty[(String, Column)])
      else derives
    MatView.registerStar(MatView.StarDef(
      name = name,
      roots = tables.map(t => () => expectedRoots(t)),
      joinKeys = joinKeys,
      view = () => Storage.readVersion(spark, view),
      keys = keys, countCol = countCol, sums = sums, mins = mins,
      maxs = maxs, counts = counts, kmvs = kmvs, kmvK = kmvK,
      sumsqs = sumsqs, sumcubes = sumcubes, sumquads = sumquads,
      covs = covs,
      fresh = () => appliedVersions(view).exists(vs =>
        vs.size == tables.size && tables.zip(vs).forall { case (t, v) =>
          Storage.currentVersion(t).contains(v) }),
      where = {
        lazy val w = resolveStarWhere(spark, tables, joinKeys, where, padded)
        () => w
      },
      derives = tables.zip(padded).map { case (t, ds) =>
        ds.map { case (n, c) =>
          lazy val e = resolveDeriveExpr(spark, t, c)
          (n, () => e)
        }
      }))
  }

  /** Resolve one derived join-key Column against its side's schema —
    * analyzed only (the comparison-time normalization in
    * [[graft.plans.MatViewSupport.normalizeDerived]] folds constants the
    * way the query's optimizer does). Lazy like the `where` resolution. */
  private def resolveDeriveExpr(spark: SparkSession, table: Path, c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    readBase(spark, table).limit(0).select(c).queryExecution.analyzed
      .collectFirst {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.head match {
            case al: org.apache.spark.sql.catalyst.expressions.Alias => al.child
            case e => e
          }
      }.getOrElse(throw new IllegalStateException(
        s"cannot resolve derived join key over $table"))

  /** [[resolveWhere]] for a FILTERED STAR view: resolve the post-join
    * predicate through the SAME join + filter + optimizer pipeline a
    * matching query goes through — the optimizer pushes conjuncts below
    * the join and infers the same constraint closure on both sides, so
    * the pooled Filter conjuncts of this plan are exactly what
    * [[graft.plans.MatViewJoinRewrite]]'s flatten pools from the query.
    * Join-key IsNotNull guards are stripped here as they are there
    * (tautological over inner-joined rows). Lazy like [[resolveWhere]]:
    * only runs at the first match attempt, after every side has commits. */
  private def resolveStarWhere(spark: SparkSession, tables: Seq[Path],
      joinKeys: Seq[(String, String)], where: Option[Column],
      derives: Seq[Seq[(String, Column)]] = Seq.empty)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    where.toSeq.flatMap { w =>
      import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, IsNotNull}
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case x => Seq(x)
      }
      val jkNames = joinKeys.flatMap { case (a, b) => Seq(a, b) }.toSet
      val ds = if (derives.isEmpty) tables.map(_ => Seq.empty[(String, Column)])
        else derives
      val reads = tables.zip(ds).map { case (t, dcols) =>
        dcols.foldLeft(readBase(spark, t)) { case (df, (n, c)) =>
          df.withColumn(n, c) }
      }
      val refs = (starFilterRefs(reads, w) ++ jkNames).distinct
      val snaps = reads.map { df =>
        df.select(refs.filter(df.columns.contains).map(col): _*)
      }
      // the optimizer infers a derived join key's null-guard on THIS plan
      // too (pushed through the computed Project and simplified) — strip
      // it from the required set exactly as the query side drops it from
      // its pooled conjuncts, or a filtered+derived star could never
      // match (the requirement would demand a conjunct the query side
      // just dropped as tautological)
      import graft.plans.MatViewSupport
      val derivedGuards: Set[Expression] = tables.zip(ds).flatMap {
        case (t, dcols) => dcols.flatMap { case (_, c) =>
          val norm = MatViewSupport.normalizeDerived(resolveDeriveExpr(spark, t, c))
          Seq(MatViewSupport.normalizeDerived(MatViewSupport.nullGuardOf(norm)),
            MatViewSupport.normalizeDerived(IsNotNull(norm)))
        }
      }.toSet
      ViewMaintain.joinConnected(snaps.head, snaps.tail, joinKeys)
        .filter(w).queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            split(f.condition)
        }.flatten.filterNot { c =>
          (c match {
            case IsNotNull(a: AttributeReference) => jkNames.contains(a.name)
            case _ => false
          }) || derivedGuards.contains(MatViewSupport.normalizeDerived(c))
        }
    }

  /** One catalog row — everything a FRESH session needs to re-register
    * ([[loadCatalog]]) and re-maintain ([[maintainCatalog]]) a view
    * without code: paths are stored absolute, partials by name. `kind`
    * is "single" (base/pk), "join" (left/right/pkLeft/pkRight/join
    * keys), or "star" (tables/pks in side order, join keys as the
    * positionally-paired joinKeysLeft/joinKeysRight name lists). */
  final case class CatalogEntry(
      name: String,
      kind: String,
      view: String,
      keys: Seq[String],
      base: String = "",
      pk: Seq[String] = Nil,
      left: String = "",
      right: String = "",
      pkLeft: Seq[String] = Nil,
      pkRight: Seq[String] = Nil,
      joinKeysLeft: Seq[String] = Nil,
      joinKeysRight: Seq[String] = Nil,
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      keepVersions: Int = 1,
      tables: Seq[String] = Nil,
      pks: Seq[Seq[String]] = Nil,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      where: String = "",
      derives: Seq[Map[String, String]] = Nil,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, Seq[String]] = Map.empty) {
    require(kind == "single" || kind == "join" || kind == "star",
      s"unknown kind '$kind'")
    require(covs.values.forall(_.size == 2),
      s"entry '$name': each covs entry must name exactly [x, y]")
    private[MatViews] def covPairs: Map[String, (String, String)] =
      covs.map { case (p, xy) => p -> (xy.head, xy(1)) }
    require(kind != "star" || (tables.size >= 2 && pks.size == tables.size),
      s"star entry '$name' needs tables (≥2) with one pk list per table")
    require(derives.isEmpty || derives.size == tables.size,
      s"entry '$name': derives must be empty or one map per star side")
    private[MatViews] def deriveCols: Seq[Seq[(String, Column)]] =
      if (derives.isEmpty) tables.map(_ => Seq.empty[(String, Column)])
      else derives.map(_.toSeq.sortBy(_._1).map { case (n, e) => n -> expr(e) })
  }

  /** The catalog file a warehouse directory carries. */
  val CatalogFile = "_MATVIEWS.json"

  private def entryJson(e: CatalogEntry): org.json4s.JValue = {
    import org.json4s.JsonDSL._
    import org.json4s.{JArray, JString}
    ("name" -> e.name) ~ ("kind" -> e.kind) ~ ("view" -> e.view) ~
      ("keys" -> e.keys) ~ ("base" -> e.base) ~ ("pk" -> e.pk) ~
      ("left" -> e.left) ~ ("right" -> e.right) ~
      ("pkLeft" -> e.pkLeft) ~ ("pkRight" -> e.pkRight) ~
      ("joinKeysLeft" -> e.joinKeysLeft) ~ ("joinKeysRight" -> e.joinKeysRight) ~
      ("sums" -> e.sums) ~ ("mins" -> e.mins) ~ ("maxs" -> e.maxs) ~
      ("counts" -> e.counts) ~ ("keepVersions" -> e.keepVersions) ~
      ("tables" -> e.tables) ~
      ("pks" -> JArray(e.pks.map(pk =>
        JArray(pk.map(JString(_)).toList)).toList)) ~
      ("kmvs" -> e.kmvs) ~ ("kmvK" -> e.kmvK) ~ ("where" -> e.where) ~
      ("derives" -> e.derives) ~ ("sumsqs" -> e.sumsqs) ~
      ("sumcubes" -> e.sumcubes) ~ ("sumquads" -> e.sumquads) ~
      ("covs" -> e.covs)
  }

  /** Every entry in `catalogDir`'s catalog (empty if none yet). */
  def catalog(catalogDir: Path): Seq[CatalogEntry] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val formats: Formats = DefaultFormats
    val f = catalogDir.resolve(CatalogFile)
    if (!Files.exists(f)) Seq.empty
    else JsonMethods.parse(new String(Files.readAllBytes(f), "UTF-8")) match {
      case JArray(es) => es.map { j =>
        CatalogEntry(
          name = (j \ "name").extract[String],
          kind = (j \ "kind").extract[String],
          view = (j \ "view").extract[String],
          keys = (j \ "keys").extract[Seq[String]],
          base = (j \ "base").extractOrElse[String](""),
          pk = (j \ "pk").extractOrElse[Seq[String]](Nil),
          left = (j \ "left").extractOrElse[String](""),
          right = (j \ "right").extractOrElse[String](""),
          pkLeft = (j \ "pkLeft").extractOrElse[Seq[String]](Nil),
          pkRight = (j \ "pkRight").extractOrElse[Seq[String]](Nil),
          joinKeysLeft = (j \ "joinKeysLeft").extractOrElse[Seq[String]](Nil),
          joinKeysRight = (j \ "joinKeysRight").extractOrElse[Seq[String]](Nil),
          sums = (j \ "sums").extractOrElse[Map[String, String]](Map.empty),
          mins = (j \ "mins").extractOrElse[Map[String, String]](Map.empty),
          maxs = (j \ "maxs").extractOrElse[Map[String, String]](Map.empty),
          counts = (j \ "counts").extractOrElse[Map[String, String]](Map.empty),
          keepVersions = (j \ "keepVersions").extractOrElse[Int](1),
          tables = (j \ "tables").extractOrElse[Seq[String]](Nil),
          pks = (j \ "pks").extractOrElse[Seq[Seq[String]]](Nil),
          kmvs = (j \ "kmvs").extractOrElse[Map[String, String]](Map.empty),
          kmvK = (j \ "kmvK").extractOrElse[Int](64),
          where = (j \ "where").extractOrElse[String](""),
          derives = (j \ "derives").extractOrElse[Seq[Map[String, String]]](Nil),
          sumsqs = (j \ "sumsqs").extractOrElse[Map[String, String]](Map.empty),
          sumcubes = (j \ "sumcubes").extractOrElse[Map[String, String]](Map.empty),
          sumquads = (j \ "sumquads").extractOrElse[Map[String, String]](Map.empty),
          covs = (j \ "covs").extractOrElse[Map[String, Seq[String]]](Map.empty))
      }
      case _ => Seq.empty
    }
  }

  /** Upsert one entry (by name) into the catalog — atomic tmp + move, so
    * a concurrent [[loadCatalog]] sees the old file or the new one, never
    * a torn write. */
  def defineView(catalogDir: Path, e: CatalogEntry): Unit = {
    import org.json4s.JArray
    import org.json4s.jackson.JsonMethods
    Files.createDirectories(catalogDir)
    val next = catalog(catalogDir).filterNot(_.name == e.name) :+ e
    val tmp = Files.createTempFile(catalogDir, ".matviews", ".tmp")
    Files.write(tmp, JsonMethods.compact(JsonMethods.render(
      JArray(next.sortBy(_.name).map(entryJson).toList))).getBytes("UTF-8"))
    Files.move(tmp, catalogDir.resolve(CatalogFile),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Remove one entry (by name) from the catalog and drop any in-session
    * registration of the same name — the view's DATA is untouched (drop
    * the table separately if it should go too). Missing names no-op. */
  def dropView(catalogDir: Path, name: String): Unit = {
    import org.json4s.JArray
    import org.json4s.jackson.JsonMethods
    val next = catalog(catalogDir).filterNot(_.name == name)
    val f = catalogDir.resolve(CatalogFile)
    if (Files.exists(f)) {
      val tmp = Files.createTempFile(catalogDir, ".matviews", ".tmp")
      Files.write(tmp, JsonMethods.compact(JsonMethods.render(
        JArray(next.sortBy(_.name).map(entryJson).toList))).getBytes("UTF-8"))
      Files.move(tmp, f,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    MatView.drop(name)
  }

  /** Re-register every cataloged view for transparent rewrite in THIS
    * session ([[registerRewrite]] / [[registerJoinRewrite]]) — the
    * new-session bootstrap. Returns how many were registered. */
  def loadCatalog(spark: SparkSession, catalogDir: Path): Int = {
    val es = catalog(catalogDir)
    es.foreach {
      case e if e.kind == "single" =>
        registerRewrite(spark, e.name, Path.of(e.base), Path.of(e.view),
          keys = e.keys, sums = e.sums, mins = e.mins, maxs = e.maxs,
          counts = e.counts, kmvs = e.kmvs, kmvK = e.kmvK,
          where = if (e.where.isEmpty) None else Some(expr(e.where)),
          sumsqs = e.sumsqs, sumcubes = e.sumcubes, sumquads = e.sumquads,
          covs = e.covPairs)
      case e if e.kind == "star" =>
        registerStarRewrite(spark, e.name, e.tables.map(Path.of(_)),
          Path.of(e.view), joinKeys = e.joinKeysLeft.zip(e.joinKeysRight),
          keys = e.keys, sums = e.sums, mins = e.mins, maxs = e.maxs,
          counts = e.counts,
          where = if (e.where.isEmpty) None else Some(expr(e.where)),
          derives = if (e.derives.isEmpty) Seq.empty else e.deriveCols,
          kmvs = e.kmvs, kmvK = e.kmvK, sumsqs = e.sumsqs,
          sumcubes = e.sumcubes, sumquads = e.sumquads, covs = e.covPairs)
      case e =>
        registerJoinRewrite(spark, e.name, Path.of(e.left), Path.of(e.right),
          Path.of(e.view), joinKeys = e.joinKeysLeft.zip(e.joinKeysRight),
          keys = e.keys, sums = e.sums, mins = e.mins, maxs = e.maxs,
          counts = e.counts, sumsqs = e.sumsqs, sumcubes = e.sumcubes,
          sumquads = e.sumquads, covs = e.covPairs)
    }
    es.size
  }

  /** What one [[maintainCatalog]] pass did, per view name. */
  final case class CatalogMaintenance(
      single: Map[String, MaintainResult],
      joins: Map[String, MaintainJoinResult],
      stars: Map[String, MaintainStarResult] = Map.empty)

  /** Maintain EVERY cataloged view — the one-call scheduled entry point a
    * fresh session (or an orchestrator slot) runs. Single-base entries
    * group per (base, pk) through [[maintainAll]], so views of one base
    * share a change feed; join entries roll via [[maintainJoin]], star
    * entries via [[maintainStar]]. */
  def maintainCatalog(spark: SparkSession, catalogDir: Path): CatalogMaintenance = {
    val es = catalog(catalogDir)
    val single = es.filter(_.kind == "single")
      .groupBy(e => (e.base, e.pk)).toSeq.flatMap { case ((base, pk), grp) =>
        val specs = grp.map(e => ViewSpec(Path.of(e.view), e.keys, e.sums,
          e.mins, e.maxs, e.counts, e.keepVersions, kmvs = e.kmvs,
          kmvK = e.kmvK,
          filter = if (e.where.isEmpty) None else Some(expr(e.where)),
          sumsqs = e.sumsqs, sumcubes = e.sumcubes, sumquads = e.sumquads,
          covs = e.covPairs))
        maintainAll(spark, Path.of(base), pk, specs)
          .zip(grp).map { case (r, e) => e.name -> r }
      }.toMap
    val joins = es.filter(_.kind == "join").map { e =>
      e.name -> maintainJoin(spark, Path.of(e.left), Path.of(e.right),
        Path.of(e.view), pkLeft = e.pkLeft, pkRight = e.pkRight,
        joinKeysLeft = e.joinKeysLeft, joinKeysRight = e.joinKeysRight,
        keys = e.keys, sums = e.sums, counts = e.counts, mins = e.mins,
        maxs = e.maxs, keepVersions = e.keepVersions, sumsqs = e.sumsqs,
        sumcubes = e.sumcubes, sumquads = e.sumquads, covs = e.covPairs)
    }.toMap
    val stars = es.filter(_.kind == "star").map { e =>
      e.name -> maintainStar(spark,
        e.tables.lazyZip(e.pks).lazyZip(e.deriveCols).toSeq.map {
          case (t, pk, ds) => StarSide(Path.of(t), pk, ds) },
        Path.of(e.view),
        joinKeys = e.joinKeysLeft.zip(e.joinKeysRight),
        keys = e.keys, sums = e.sums, counts = e.counts, mins = e.mins,
        maxs = e.maxs, keepVersions = e.keepVersions,
        filter = if (e.where.isEmpty) None else Some(expr(e.where)),
        kmvs = e.kmvs, kmvK = e.kmvK, sumsqs = e.sumsqs,
        sumcubes = e.sumcubes, sumquads = e.sumquads, covs = e.covPairs)
    }.toMap
    CatalogMaintenance(single, joins, stars)
  }

  /** One publish of a workspace transaction AND the views it makes
    * stale — the composition [[Workspace.commitAll]] + [[maintainCatalog]]
    * could previously only run as two separate publishes, leaving a
    * window where a snapshot reader saw the new bases pinned beside
    * not-yet-rolled views (safe — freshness guards kept rewrites honest —
    * but visible). Here the member tables commit through their CAS logs,
    * every cataloged view rolls forward, and base + view pins land in ONE
    * workspace manifest.
    *
    * Coherence guarantee (exact, not a blanket atomicity claim): a view
    * pin rides the manifest ONLY when every member base the view derives
    * from was WRITTEN by this transaction and the view's applied-version
    * markers equal exactly those committed versions. The CAS conflict
    * guard in [[Workspace.commitAll]] aborts if a written table's
    * published pin moved, so every manifest this call publishes pins such
    * a view beside precisely the base versions it reflects — a reader can
    * never observe one of OUR pins placing a view AHEAD of its base. If a
    * concurrent writer advances a base between our table commits and the
    * maintenance hook (maintenance then reflects the NEWER base), or a
    * view derives from a member base this transaction did not write, the
    * view still maintains but its pin is DROPPED for this manifest — the
    * manifest keeps the view's previous pin, a stale-but-safe pair the
    * freshness guard already handles, never a view ahead of its base.
    *
    * Views whose table lives DIRECTLY inside `ws` are pinned by their
    * member name; views outside the workspace still maintain but ride no
    * pin (they are not members). Tables written by [[Workspace.commitAll]]
    * are flat full rewrites, so their views re-bootstrap per
    * [[maintainAll]]'s fallback — proportional to a base the transaction
    * itself just rewrote; manifested bases (alsoPin members fed by pruned
    * upserts) keep their incremental feeds. A redelivered same-token
    * transaction returns its twin's manifest without re-maintaining.
    *
    * Returns (manifest id, the maintenance outcomes — None on an
    * idempotent replay). */
  def workspaceCommitWithViews(
      spark: SparkSession,
      ws: Path,
      catalogDir: Path,
      writes: Map[String, DataFrame],
      alsoPin: Set[String] = Set.empty,
      keepVersions: Int = 4,
      idempotencyToken: Option[String] = None,
      basedOn: Option[Map[String, Long]] = None): (Long, Option[CatalogMaintenance]) = {
    var maint: Option[CatalogMaintenance] = None
    val m = Workspace.commitAll(ws, writes, alsoPin, keepVersions,
      idempotencyToken, basedOn,
      afterCommit = committed => {
        val cm = maintainCatalog(spark, catalogDir)
        maint = Some(cm)
        val wsRoot = ws.toAbsolutePath.normalize
        def memberName(p: String): Option[String] = {
          val ap = Path.of(p).toAbsolutePath.normalize
          if (Option(ap.getParent).contains(wsRoot))
            Some(ap.getFileName.toString)
          else None
        }
        catalog(catalogDir).flatMap { e =>
          memberName(e.view).flatMap { viewMember =>
            // (base path, version the view's state reflects) per side,
            // straight from the maintenance results — no disk re-read
            val applied: Option[(Long, Seq[(String, Long)])] = e.kind match {
              case "single" => cm.single.get(e.name).map(r =>
                r.viewVersion -> Seq(e.base -> r.appliedBase))
              case "join" => cm.joins.get(e.name).map(r =>
                r.viewVersion ->
                  Seq(e.left -> r.appliedLeft, e.right -> r.appliedRight))
              case _ => cm.stars.get(e.name)
                .filter(_.applied.size == e.tables.size).map(r =>
                  r.viewVersion -> e.tables.zip(r.applied))
            }
            applied.collect {
              // pin only when EVERY member base was written this txn AND
              // the view reflects exactly the committed version — see the
              // coherence guarantee above
              case (viewV, bases) if bases.forall { case (bp, av) =>
                  memberName(bp).exists(bn => committed.get(bn).contains(av))
                } => viewMember -> viewV
            }
          }
        }.toMap
      })
    (m, maint)
  }

  /** Navigation observability ([[graft.plans.MatViewExplain]]): which
    * registered view served each Aggregate of `df` — and, per fallen-back
    * Aggregate, each registration's first failing guard (root mismatch,
    * unmatched WHERE slice, stale markers, join-edge mismatch, unservable
    * shape), produced by the SAME probe code path the rewrite rules run.
    * Use [[explainNavigationString]] for the rendered block. */
  def explainNavigation(df: DataFrame): Seq[graft.plans.MatViewExplain.AggReport] =
    graft.plans.MatViewExplain.explain(df)

  /** [[explainNavigation]], rendered. */
  def explainNavigationString(df: DataFrame): String =
    graft.plans.MatViewExplain.explainString(df)

  /** One scan, grouped once, answering min/max for (at least) the flagged
    * keys: stats-range-pruned + exact-key-filtered when the flagged key
    * set fits the driver, else the full base (a per-column `isin` over a
    * multi-column key is a cartesian SUPERSET of the flagged set — safe,
    * the caller's left join picks only the groups it flagged). */
  private def recomputeExtremes(
      spark: SparkSession, base: Path, to: Long, keys: Seq[String],
      mins: Map[String, String], maxs: Map[String, String],
      flaggedKeys: DataFrame, n: Long, maxCollectedGroups: Int,
      kmvs: Map[String, String] = Map.empty, kmvK: Int = 64,
      filter: Option[Column] = None): DataFrame = {
    val scan: DataFrame =
      if (n > maxCollectedGroups) readBaseAt(spark, base, to)
      else {
        val rows = flaggedKeys.collect()
        val perCol = keys.zipWithIndex.map { case (k, i) =>
          (k, rows.map(_.get(i)).toSeq) }
        val ranges = perCol.flatMap { case (k, vs) =>
          val nn = vs.filter(_ != null)
          def bd(x: Any): Option[BigDecimal] = x match {
            case b: Byte => Some(BigDecimal(b.toInt))
            case s: Short => Some(BigDecimal(s.toInt))
            case i: Int => Some(BigDecimal(i))
            case l: Long => Some(BigDecimal(l))
            case f: Float => Some(BigDecimal(f.toDouble))
            case d: Double => Some(BigDecimal(d))
            case _ => None
          }
          if (nn.isEmpty) None
          else if (nn.forall(bd(_).isDefined)) {
            val ds = nn.flatMap(bd)
            Some(MetaAgg.NumRange(k, ds.min, ds.max))
          } else if (nn.forall(_.isInstanceOf[String])) {
            val ss = nn.map(_.asInstanceOf[String])
            Some(MetaAgg.StrRange(k, ss.min, ss.max))
          } else None
        }
        val pred = perCol.map { case (k, vs) =>
          val nn = vs.filter(_ != null).distinct
          val base0 =
            if (nn.isEmpty) lit(false) else col(k).isin(nn: _*)
          if (vs.contains(null)) base0 || col(k).isNull else base0
        }.reduce(_ && _)
        // readPrunedWhere resolves the CURRENT version internally (its
        // file selection happens eagerly, at build). If the base is still
        // at the pinned `to` AFTER that selection, the captured version v
        // satisfies to <= v <= current == to, so the pruned scan reads
        // exactly version `to`; a base that advanced mid-build falls back
        // to the pinned unpruned read — rare, never wrong.
        val pruned = MetaAgg.readPrunedWhere(spark, base, ranges)
        if (Storage.currentVersion(base).contains(to)) pruned.filter(pred)
        else readBaseAt(spark, base, to).filter(pred)
      }
    val aggs = mins.map { case (b, v) => min(col(b)).as(v) } ++
      maxs.map { case (b, v) => max(col(b)).as(v) } ++
      kmvs.map { case (b, v) =>
        graft.plans.KmvSketch.partialCol(col(b), kmvK).as(v) }
    filter.fold(scan)(scan.filter).groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail.toSeq: _*)
  }
}

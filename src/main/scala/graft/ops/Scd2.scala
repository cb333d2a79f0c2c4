package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 2 machinery (SURVEY.md §2.7 M3-M5).
  *
  * The reference runs a two-statement transaction per dimension load
  * (UPDATE-join closes changed current versions, INSERT opens new ones —
  * ref: dwh_dim_character.py:49-118). On immutable storage both statements
  * collapse into ONE declarative pass that computes the dimension's next
  * state; atomicity is write-temp-then-swap (or Delta MERGE).
  *
  * Conventions (documented engine deviations from Postgres):
  *  - `'infinity'::timestamptz` → sentinel 9999-12-31 23:59:59 UTC.
  *  - `SERIAL` surrogate keys → `row_number()` over (business key, valid_from)
  *    + max-existing offset: deterministic, oracle-comparable, and — unlike
  *    `monotonically_increasing_id` — stable across partitionings.
  *
  * Scale notes: the windows partition by business key (no global ordering →
  * no single-task sort). The close-and-insert join shuffles dim ∪ stg on the
  * business key once; history rows pass through untouched via union, so cost
  * is O(current + increment), not O(history).
  */
object Scd2 {

  val InfinityTs = "9999-12-31 23:59:59"
  def infinity: Column = lit(InfinityTs).cast("timestamp")

  /** Build a full SCD2 version history from a change log (one row per
    * observation of a business key, ordered by an event-time column).
    *
    * Steps, all window-per-key (no global shuffle beyond the key hash):
    *  1. drop consecutive observations with unchanged tracked attrs
    *     (null-safe, F2 semantics) — lag() per key;
    *  2. valid_from = observation time, valid_to = next version's valid_from
    *     (lead) or the infinity sentinel;
    *  3. is_current = last version per key;
    *  4. version surrogate = row_number per key (deterministic).
    */
  def fromChangeLog(
      changes: DataFrame,
      bk: String,
      eventTime: String,
      tracked: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {

    val ord = (eventTime +: tieBreak).map(col)
    val wOrd = Window.partitionBy(bk).orderBy(ord: _*)

    val same = tracked
      .map(c => col(c) <=> lag(col(c), 1).over(wOrd))
      .reduce(_ && _)
    val isFirst = row_number().over(wOrd) === 1

    val deduped = changes
      .withColumn("__keep", isFirst || !same)
      .filter(col("__keep"))
      .drop("__keep")

    val w2 = Window.partitionBy(bk).orderBy(ord: _*)
    deduped
      .withColumn("valid_from", col(eventTime))
      .withColumn("valid_to",
        coalesce(lead(col(eventTime), 1).over(w2), infinity))
      .withColumn("is_current", lead(col(eventTime), 1).over(w2).isNull)
      .withColumn("version", row_number().over(w2))
  }

  /** M5: globally-unique surrogate keys for a freshly built dimension:
    * row_number over (bk, valid_from) — deterministic and dense. Per-key
    * `version` numbers are NOT surrogate keys (they collide across keys).
    * The global window sort is acceptable for bounded dims; unbounded
    * tables use [[withScalableSk]] (same keys, no single-task sort). */
  def withGlobalSk(dim: DataFrame, bk: String, skCol: String = "sk"): DataFrame =
    dim.withColumn(skCol,
      row_number().over(Window.orderBy(col(bk), col("valid_from"))).cast("long"))

  /** M5 at scale: the same dense, deterministic surrogate keys as
    * [[withGlobalSk]] — identical (row → sk) mapping, asserted in
    * Scd2Spec — with NO single-partition sort anywhere:
    *
    *  1. `repartitionByRange(ordCols)` spreads the sort across N tasks
    *     (range exchange, parallel);
    *  2. one count per partition comes back to the driver — O(N) rows,
    *     never data — and prefix-sums into per-partition offsets;
    *  3. sk = offset(partition) + row_number within the partition.
    *
    * `ordCols` must be a total order (unique per row), which it must be
    * for ANY deterministic sk assignment — under a total order the
    * result is independent of where the range boundaries land. The
    * input is localCheckpointed so the count job and the output job see
    * the same partitioning (range boundaries come from sampling; two
    * separate computations of the same plan are not guaranteed to
    * produce them identically). */
  def withScalableSk(dim: DataFrame, ordCols: Seq[String],
      skCol: String = "sk", partitions: Int = 0): DataFrame = {
    val (ranged, offsetOf) = rangeOffsets(dim, ordCols, lit(1L), partitions)
    val wPid = Window.partitionBy(col("__pid")).orderBy(ordCols.map(col): _*)
    ranged
      .withColumn(skCol, (offsetOf + row_number().over(wPid)).cast("long"))
      .drop("__pid")
  }

  /** The shared two-phase global-prefix mechanism behind [[withScalableSk]]
    * and [[Corpus.packSequences]]: range-partition on `ordCols`, bring back
    * ONE per-partition total of `weight` (O(partitions) rows, never data),
    * prefix-sum on the driver, and return the ranged frame (tagged
    * `__pid`) plus a column giving each row its partition's starting
    * offset. The input is localCheckpointed so the totals job and the
    * output job see identical range boundaries (they come from sampling —
    * two separate computations of the same plan are not guaranteed to
    * reproduce them). `weight` must be non-null per row. */
  private[ops] def rangeOffsets(
      df: DataFrame, ordCols: Seq[String], weight: Column,
      partitions: Int): (DataFrame, Column) = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, ordCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy(col("__pid")).agg(sum(weight).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
    val offsetOf = element_at(
      map((0 until n).flatMap(p => Seq(lit(p), lit(offsets(p)))): _*), col("__pid"))
    (ranged, offsetOf)
  }

  /** M3: one batch close-and-insert against an existing dimension.
    *
    * Classifies (current dim) ⟕ (staging increment) rows into
    * {unchanged, changed→close, changed/new→open}, exactly the reference's
    * UPDATE+INSERT pair, and returns the dimension's complete next state:
    * history ∪ kept-current ∪ closed ∪ opened.
    *
    * `dim` schema: bk ++ tracked ++ (skCol, valid_from, valid_to, is_current).
    * `stg` schema: bk ++ tracked.
    *
    * Duplicate-bk staging rows: with `tieBreak` given, the maximal row by
    * those columns wins (deterministic, [[MergeOps.latestByKey]]); without,
    * callers must pre-dedupe deterministically.
    */
  def closeAndInsert(
      dim: DataFrame,
      stg: DataFrame,
      bk: String,
      tracked: Seq[String],
      runTs: Column,
      skCol: String = "sk",
      tieBreak: Seq[Column] = Nil,
      skBase: Option[Long] = None): DataFrame = {

    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))

    val stgOne =
      if (tieBreak.nonEmpty) MergeOps.latestByKey(stg, Seq(bk), tieBreak)
      else stg.dropDuplicates(bk)

    val dimColsAll = (Seq(bk) ++ tracked ++
      Seq(skCol, "valid_from", "valid_to", "is_current"))
    // PROVABLY-EMPTY dim (the bootstrap load: [[emptyDim]] is a typed
    // `.limit(0)` frame): every staging row is `isNew`, history/kept/closed
    // are empty, and the SK high-water mark is 0 — the full-outer join,
    // its exchanges, and the max(sk) job all vanish (guide §2.4). The
    // (row → sk) mapping is the identical withScalableSk order.
    if (Storage.provablyEmpty(dim.queryExecution.analyzed)) {
      val openedBase0 = stgOne.select(
        (Seq(col(bk)) ++ tracked.map(col) ++ Seq(
          runTs.as("valid_from"),
          infinity.as("valid_to"),
          lit(true).as("is_current"))): _*)
      return withScalableSk(openedBase0, Seq(bk), "__sk")
        .withColumn(skCol, (col("__sk") + lit(skBase.getOrElse(0L))).cast("long"))
        .drop("__sk")
        .select(dimColsAll.map(col): _*)
    }
    val c = current.alias("c")
    val s = stgOne.alias("s")
    val joined = c.join(s, col(s"c.$bk") === col(s"s.$bk"), "full_outer")

    val isNew = col(s"c.$bk").isNull
    val isGone = col(s"s.$bk").isNull // bk absent from increment → keep as-is
    val changed = Extract.anyChanged(tracked.map(x => (col(s"c.$x"), col(s"s.$x"))))

    val dimCols = (Seq(bk) ++ tracked ++ Seq(skCol, "valid_from", "valid_to", "is_current"))

    // current rows that survive unchanged (or have no incoming row)
    val kept = joined.filter(!isNew && (isGone || !changed))
      .select(dimCols.map(x => col(s"c.$x").as(x)): _*)

    // current rows whose attrs changed → closed at runTs
    val closed = joined.filter(!isNew && !isGone && changed)
      .select(dimCols.map {
        case "valid_to"   => runTs.as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case x            => col(s"c.$x").as(x)
      }: _*)

    // new business keys or changed attrs → new open version, SK assigned
    // deterministically above the existing max. SK assignment goes through
    // [[withScalableSk]] (range partitions + O(partitions) driver offsets):
    // the (row → sk) mapping is IDENTICAL to row_number over a global
    // bk-order window, but a bulk initial load no longer funnels the whole
    // dimension through one single-partition sort task (Scd2Spec asserts
    // both the key equality and the absence of an unkeyed window).
    // skBase overrides the derived max for callers whose `dim` is only a
    // SLICE of the dimension (the pruned path): the high-water mark must
    // be global or new SKs would collide with unseen buckets' keys
    val maxSk = skBase.getOrElse(
      dim.agg(coalesce(max(col(skCol)), lit(0L)).cast("long")).first().getLong(0))
    val openedBase = joined.filter(isNew || (!isGone && changed))
      .select(
        (Seq(col(s"s.$bk").as(bk)) ++
          tracked.map(x => col(s"s.$x").as(x)) ++ Seq(
          runTs.as("valid_from"),
          infinity.as("valid_to"),
          lit(true).as("is_current"))): _*)
    // bk is unique here (stgOne is deduped), so Seq(bk) is a total order
    val opened = withScalableSk(openedBase, Seq(bk), "__sk")
      .withColumn(skCol, (col("__sk") + lit(maxSk)).cast("long"))
      .drop("__sk")
      .select(dimCols.map(col): _*)

    history.select(dimCols.map(col): _*)
      .unionByName(kept).unionByName(closed).unionByName(opened)
  }

  /** SCD2 close-and-insert at dimension scale: the table is PK-hash
    * bucketed in a partition-manifested commit log
    * ([[Storage.commitPartitions]]), and an incremental load rewrites ONLY
    * the buckets containing incoming business keys — the rest of the
    * dimension (history included) carries forward by manifest reference,
    * bytes unmoved. The M3 analogue of
    * [[MergeOps.prunedConditionalUpsert]], for dims too big to rewrite
    * per load (a consumer-scale user dimension at 1e9 rows); small dims
    * should keep the plain [[closeAndInsert]]+commitVersion path, whose
    * single version dir also gives simple time travel.
    *
    * Reads: affected buckets in full, plus ONE column-pruned scan of the
    * whole dimension for the global SK high-water mark (metadata-cheap:
    * parquet reads just the sk column; at deploy the max would live in
    * table metadata). Writes: O(affected buckets). The (row → sk)
    * mapping is IDENTICAL to the full-rewrite path — Scd2PrunedSpec
    * asserts state equality after multiple loads and byte-identity of
    * untouched buckets. */
  def prunedCloseAndInsert(
      table: java.nio.file.Path,
      stgDelta: DataFrame,
      bk: String,
      tracked: Seq[String],
      runTs: Column,
      skCol: String = "sk",
      nParts: Int = 64,
      tieBreak: Seq[Column] = Nil): Long = {
    val spark = stgDelta.sparkSession
    Storage.validateGeometry(table, nParts) // wrong nParts = wrong buckets read
    val bucket = MergeOps.pkBucket(Seq(bk), nParts)

    if (Storage.currentVersion(table).isEmpty) { // bootstrap: full load
      val next = closeAndInsert(emptyDim(stgDelta, bk, tracked, skCol),
        stgDelta, bk, tracked, runTs, skCol, tieBreak, skBase = Some(0L))
      return Storage.commitPartitions(next.withColumn("pbucket", bucket), table, "pbucket")
    }

    // read-snapshot OCC (same contract as MergeOps.prunedConditionalUpsert):
    // every read below — probe, SK high-water mark, merge input — pins ONE
    // version; the commit declares that pin. The SK mark is a GLOBAL read,
    // so ANY winner that moved data invalidates this load (staleOnAny): two
    // unpinned concurrent loads could allocate colliding surrogate keys
    // even on disjoint buckets.
    // same one-materialization discipline as prunedConditionalUpsert: the
    // deduped delta feeds the bucket probe, the change probe and the merge;
    // pin it once when re-evaluating the upstream pipeline is expensive
    val pin = !MergeOps.cheapToRecompute(stgDelta)
    val one0 =
      if (tieBreak.nonEmpty) MergeOps.latestByKey(stgDelta, Seq(bk), tieBreak)
      else stgDelta.dropDuplicates(bk)
    val one = if (pin) one0.localCheckpoint() else one0
    val probeSrc = if (pin) one else stgDelta
    Storage.retryStale(table) {
    val readV = Storage.currentVersion(table).get
    val candidate = MergeOps.affectedBuckets(probeSrc, Seq(bk), nParts)
    val old = Storage.readPartitionedVersionAt(spark, table, readV, Some(candidate))
      .drop("pbucket")
    // prune by CHANGE, not presence (same contract as
    // prunedConditionalUpsert): a delta row equal to its current version
    // neither closes nor opens anything — rewriting its bucket would be
    // pure write amplification, and re-delivering an identical load must
    // rewrite ZERO buckets
    val changedKeys = one.alias("i")
      .join(old.filter(col("is_current")).withColumn("__matched", lit(true)).alias("o"),
        col(s"i.$bk") <=> col(s"o.$bk"), "left")
      .filter(col("o.__matched").isNull ||
        Extract.anyChanged(tracked.map(x => (col(s"o.$x"), col(s"i.$x")))))
      .select(col(s"i.$bk").as(bk))
    val affected = MergeOps.affectedBuckets(changedKeys, Seq(bk), nParts)
    if (affected.isEmpty) // nothing changed: metadata-only commit, no scans
      Storage.commitPartitions(
        old.limit(0).withColumn("pbucket", bucket), table, "pbucket",
        readBase = Some(readV), staleOn = candidate)
    else {
    // the global SK high-water mark needs the WHOLE dimension (a bucket
    // slice could derive a colliding local max) — but only once we know
    // something will actually open; the no-change path above never scans.
    // Served from the commit's per-file stats when they are exact
    // (MetaAgg.columnRangeAt — the pinned version's Delta-log add stats):
    // at 100 TB this replaces a full-dimension scan PER LOAD with a
    // metadata read. Falls back to the scan whenever metadata cannot
    // answer exactly (statless or DV'd files, non-integer tag).
    val maxSk = MetaAgg.columnRangeAt(table, readV, skCol) match {
      case Some(("i", _, mx)) => mx.toLong
      case _ =>
        Storage.readPartitionedVersionAt(spark, table, readV)
          .agg(coalesce(max(col(skCol)), lit(0L)).cast("long"))
          .first().getLong(0)
    }
    val oldAffected =
      Storage.readPartitionedVersionAt(spark, table, readV, Some(affected))
        .drop("pbucket")
    val affectedIds = affected.map(_.stripPrefix("pbucket=").toInt).toSeq
    // merge the SAME deduped rows the pruning probe saw (duplicate-pick
    // agreement — see MergeOps.prunedConditionalUpsert)
    val next = closeAndInsert(oldAffected,
      one.filter(bucket.isin(affectedIds: _*)),
      bk, tracked, runTs, skCol, tieBreak, skBase = Some(maxSk))
    Storage.commitPartitions(next.withColumn("pbucket", bucket), table, "pbucket",
      readBase = Some(readV), staleOnAny = true)
    }
    }
  }

  /** Empty dimension frame typed from a staging frame — THE bootstrap
    * schema (bk + tracked + sk/valid_from/valid_to/is_current), shared by
    * [[prunedCloseAndInsert]], PipelineRunner, and the specs so an added
    * audit column cannot drift between call sites. */
  def emptyDim(stg: DataFrame, bk: String, tracked: Seq[String],
      skCol: String = "sk"): DataFrame =
    stg.select(col(bk) +: tracked.map(col): _*).limit(0)
      .withColumn(skCol, lit(0L))
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC changelog application — the M-family (SURVEY.md §2.7) extended with
  * DELETES. The reference's pipeline is insert/update-only (`ON CONFLICT DO
  * UPDATE / DO NOTHING`); any engine ingesting change streams (Debezium-style
  * row images, Delta CDF) also needs ordered upsert+delete application to
  * roll a snapshot forward.
  *
  * Semantics: the changelog is a set of (pk, seq, op, payload) rows where
  * `op` is "U" (upsert — insert when the key is absent, update when present)
  * or "D" (delete). Per key, ONLY the operation with the greatest `seq`
  * decides the key's fate: a snapshot is a point-in-time state, so
  * intermediate operations collapse (U then D = gone; D then U = the new
  * row) — exactly Delta/Iceberg MERGE-from-changelog semantics.
  *
  * Scale shape: per-key latest-op reduction is [[MergeOps.latestByKey]]
  * (max_by — map-side combinable: a hot key reduces to one candidate per
  * input partition BEFORE the shuffle, unlike a window/row_number which
  * shuffles and sorts every change row). Then one full-outer join with the
  * base on the PK — shuffle-on-PK both sides, or exchange-free with
  * PK-bucketed storage.
  */
object Cdc {

  /** Roll `base` forward by `changes`. Returns the next snapshot with
    * schema pk ++ payloadCols (base must contain those columns; extra base
    * columns are dropped).
    *
    * `base` must be UNIQUE on `pk` — it is a snapshot, and a duplicate key
    * would fan out through the full-outer join into duplicated/partially-
    * updated rows with no warning (same contract as MergeOps targets).
    *
    * @param seqCol  total order within a key (a commit LSN / kafka offset);
    *                duplicate (pk, seq) pairs are a contract violation —
    *                max_by would pick an arbitrary one.
    * @param opCol   "U" | "D" per change row.
    */
  def applyChangelog(
      base: DataFrame,
      changes: DataFrame,
      pk: Seq[String],
      seqCol: String,
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    // overlapping roles would produce duplicate/ambiguous column
    // references deep in the analyzer — fail loudly at the API edge
    val roles = pk ++ Seq(seqCol, opCol) ++ payloadCols
    require(roles.distinct.size == roles.size,
      s"pk, seqCol, opCol and payloadCols must be pairwise disjoint (got $roles)")

    val latest = MergeOps.latestByKey(
      changes.select((pk ++ Seq(seqCol, opCol) ++ payloadCols).map(col): _*),
      pk, Seq(col(seqCol)))

    val b = base.select((pk ++ payloadCols).map(col): _*).alias("b")
    val l = latest.alias("l")
    val joined = b.join(l,
      pk.map(k => col(s"b.$k") <=> col(s"l.$k")).reduce(_ && _), "full_outer")

    val hasChange = col(s"l.$opCol").isNotNull
    joined
      .filter(!hasChange || col(s"l.$opCol") =!= "D")
      .select(
        pk.map(k => coalesce(col(s"l.$k"), col(s"b.$k")).as(k)) ++
          payloadCols.map(c =>
            when(hasChange, col(s"l.$c")).otherwise(col(s"b.$c")).as(c)): _*)
  }

  /** The inverse of [[applyChangelog]]: GENERATE the change feed between two
    * retained versions of a partition-manifested table (Delta CDF /
    * `table_changes` semantics, computed after the fact from snapshots).
    *
    * The 100 TB shape is in the pruning, not the join:
    * [[Storage.partitionsChangedBetween]] diffs the two versions' partition
    * manifests — metadata-only — and ONLY buckets whose owning version
    * changed are read from either snapshot. Carried-by-reference buckets
    * are byte-identical by construction, so a load that rewrote 3 of 64
    * buckets yields a diff that scans 3 buckets twice, never the table.
    * Within the scanned buckets, rows are matched with one null-safe
    * full-outer join on the PK (both sides bucketed by the same
    * `pkBucket`, so a key meets only its own bucket's rows) and unchanged
    * rows — rewritten alongside a changed neighbour — are dropped by a
    * value compare on `compareCols`.
    *
    * Returns pk ++ compareCols ++ `change_type` ("insert" | "update" |
    * "delete"); insert/update rows carry the `toV` values, delete rows the
    * `fromV` values. With `preImages` set, each update instead emits TWO
    * rows — "update_preimage" (fromV values) and "update_postimage" (toV
    * values) — the Delta CDF shape that makes the feed directly consumable
    * by additive aggregate maintenance: retract the preimage, add the
    * postimage ([[AggMaintain.applyDelta]] with signed partials).
    * `compareCols` must cover every column a consumer treats as data — a
    * column outside it can change without emitting a row. */
  def changeDataFeed(
      spark: SparkSession,
      table: java.nio.file.Path,
      fromV: Long,
      toV: Long,
      pk: Seq[String],
      compareCols: Seq[String],
      preImages: Boolean = false): DataFrame = {
    // overlap would emit duplicate output columns; empty compareCols would
    // make every matched row look unchanged; the two injected names would
    // be silently shadowed/duplicated — all caller bugs, failed loudly
    val roles = pk ++ compareCols
    require(compareCols.nonEmpty && roles.distinct.size == roles.size,
      s"pk and compareCols must be non-empty and pairwise disjoint (got $roles)")
    require(!roles.contains("__present") && !roles.contains("change_type"),
      "'__present' and 'change_type' are reserved by changeDataFeed")
    // manifest diff alone misses merge-on-read deletes: a deletion-vector
    // commit moves no manifest entry, yet its buckets' visible rows shrank
    val changed = Storage.partitionsChangedBetween(table, fromV, toV) ++
      Storage.dvChangedBuckets(table, fromV, toV)
    val cols = pk ++ compareCols
    def snap(v: Long) =
      Storage.readPartitionedVersionAt(spark, table, v, Some(changed))
        .select(cols.map(col): _*)
    val o = snap(fromV).withColumn("__present", lit(true)).alias("o")
    val n = snap(toV).withColumn("__present", lit(true)).alias("n")
    val matched =
      o.join(n, pk.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _), "full_outer")
    val inserted = col("o.__present").isNull
    val deleted = col("n.__present").isNull
    val updated = !inserted && !deleted &&
      Extract.anyChanged(compareCols.map(c => (col(s"o.$c"), col(s"n.$c"))))
    // one struct per emitted row, exploded in a single pass (no
    // self-union re-reading the join for the two-row update shape)
    def img(side: String, ct: String) = struct(
      pk.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
        compareCols.map(c => col(s"$side.$c").as(c)) :+
        lit(ct).as("change_type"): _*)
    val rows = when(inserted, array(img("n", "insert")))
      .when(deleted, array(img("o", "delete")))
      .otherwise(
        if (preImages) array(img("o", "update_preimage"), img("n", "update_postimage"))
        else array(img("n", "update")))
    matched
      .filter(inserted || deleted || updated)
      .select(inline(rows))
  }
}

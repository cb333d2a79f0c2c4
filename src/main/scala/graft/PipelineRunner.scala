package graft

import java.nio.file.Path

import graft.ops.{MergeOps, Scd2, Storage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, re-runnable raw→stg→dwh pipeline — the reference's DAG
  * semantics as a system, not a single query (SURVEY.md §3):
  *
  *  - raw:  last-writer-wins event snapshot visible up to `asOf`
  *          (S3, extract_api_operator.py:36-43)
  *  - stg:  conditional upsert into a persisted table — only changed
  *          profiles rewritten, loaded_at preserved (M1, stg_character.py:65-81)
  *  - dwh:  SCD2 user dimension close-and-insert (M3, dwh_dim_character.py:49-118)
  *          + append-only order fact via anti-join (J4/M2,
  *          dwh_fact_character_episode.py:102-107)
  *
  * Every table write goes through the versioned commit log — the
  * BEGIN/COMMIT analog (M4): each run is one commit per layer, concurrent
  * readers keep their resolved snapshot, and the previous run's state
  * stays readable via [[Storage.readVersionAt]] until vacuumed.
  * Re-running with the same `asOf` is a no-op on every layer
  * (idempotence, verified in PipelineRunnerSpec).
  *
  * The stg layer is the 100 TB write shape end-to-end: a HIGH-WATERMARK
  * delta extraction (only users with events since the previous run's
  * cutoff enter the load) feeding [[MergeOps.prunedConditionalUpsert]],
  * so each run rewrites only the PK-hash buckets containing changed
  * users — untouched buckets carry forward by commit-log manifest
  * reference, bytes unmoved. The watermark advances AFTER the commit:
  * a crash between commit and watermark write just makes the next run's
  * delta larger (the upsert is idempotent on unchanged rows), never
  * loses data.
  */
object PipelineRunner {

  final case class Layers(stgUsers: Path, dimUsers: Path, factOrders: Path)

  def layers(workDir: Path): Layers = Layers(
    workDir.resolve("stg_users"),
    workDir.resolve("dim_users"),
    workDir.resolve("fact_orders"))

  private def readOr(spark: SparkSession, p: Path, empty: => DataFrame): DataFrame =
    Storage.readVersionOr(spark, p, empty)

  private val StgBuckets = 16

  private def watermarkFile(workDir: Path): Path = workDir.resolve("_stg_watermark")

  private def readWatermark(workDir: Path): Option[String] = {
    val p = watermarkFile(workDir)
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  private def writeWatermark(workDir: Path, asOf: String): Unit = {
    val p = watermarkFile(workDir)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, asOf.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** One pipeline run: events/orders visible up to `asOf` (event-time and
    * order-date cutoffs), stamped with frozen `runTs`. `lateness` is the
    * deployment knob for how far BEHIND the previous watermark a
    * late-arriving event may land and still be picked up by this run's
    * delta; events later than that are dropped — the standard watermark
    * trade, tune it to the extractor's actual delivery lag. */
  def run(spark: SparkSession, dir: String, workDir: Path,
      asOfEventTs: String, asOfOrderDate: String, runTs: String,
      lateness: String = "2 DAYS"): Unit = {
    val l = layers(workDir)
    // single-writer startup: clear promoted-but-unpointed crash orphans so
    // this run's commits can't collide with them (Storage CAS contract)
    Seq(l.stgUsers, l.dimUsers, l.factOrders).foreach(Storage.repairOrphans)
    val runTsCol = lit(runTs).cast("timestamp")

    // ---- raw → stg: high-watermark delta, partition-pruned upsert (M1)
    val visible = Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .filter(col("ts") <= lit(asOfEventTs).cast("timestamp"))
    // delta extraction: only users with events since (previous cutoff −
    // lateness horizon) enter the load — for them the visible-latest
    // equals the full-snapshot value, and users without new events hold
    // their correct row (the ON CONFLICT incremental contract). The
    // horizon re-opens the window for LATE-ARRIVING events whose event
    // time predates the watermark (the raw extract can deliver them any
    // time); events later than the horizon are dropped — the standard
    // watermark trade, same contract as Structured Streaming's
    // withWatermark, and the horizon is the knob.
    val changed = readWatermark(workDir) match {
      case Some(wm) =>
        val reopened = lit(wm).cast("timestamp") - expr(s"INTERVAL $lateness")
        val changedUsers = Tables.events(spark, dir)
          .withColumn("ts", col("ts").cast("timestamp"))
          .filter(col("ts") > reopened &&
            col("ts") <= lit(asOfEventTs).cast("timestamp"))
          .select(col("user_id")).distinct()
        visible.join(changedUsers, Seq("user_id"), "left_semi")
      case None => visible // bootstrap: full load
    }
    val snapshot = MergeOps.latestByKey(changed, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_type"), col("value"),
        lit(null).cast("timestamp").as("loaded_at"),
        lit(null).cast("timestamp").as("last_upd_at"))
    MergeOps.prunedConditionalUpsert(l.stgUsers, snapshot,
      pk = Seq("user_id"), tracked = Seq("event_type", "value"),
      runTs = runTsCol, nParts = StgBuckets)
    writeWatermark(workDir, asOfEventTs) // only after the commit succeeded

    // ---- stg → dwh dim: SCD2 close-and-insert (M3/M5)
    val stg = Storage.readPartitionedVersion(spark, l.stgUsers)
      .select(col("user_id"), col("event_type"), col("value"))
    val dimPrev = readOr(spark, l.dimUsers,
      Scd2.emptyDim(stg, "user_id", Seq("event_type", "value")))
    val dimNext = Scd2.closeAndInsert(dimPrev, stg, "user_id",
      Seq("event_type", "value"), runTsCol, "sk")
    Storage.commitVersion(dimNext, l.dimUsers)

    // ---- dwh fact: BK→SK resolution + incremental anti-join append (J2/J4)
    //
    // Append-only facts are the natural pruned-commit shape: each run's
    // new rows land in THEIR OWN load_epoch partition and every earlier
    // run's partition carries forward by manifest reference — the fact
    // table (the biggest table in any warehouse) is never rewritten. The
    // anti-join against existing keys is a column-pruned READ (o_orderkey
    // only); the write is O(new rows). A re-run's empty delta commits a
    // version with zero rewritten partitions (asserted in the spec).
    val dimCurrent = Storage.readVersion(spark, l.dimUsers)
      .filter(col("is_current"))
      .select(col("user_id"), col("sk").as("user_sk"))
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate").cast("date") <= lit(asOfOrderDate).cast("date"))
      // synthetic FK: orders have no user_id — map custkey into user space
      .withColumn("user_id", col("o_custkey") % 15)
    val resolved = orders
      .join(broadcast(dimCurrent), Seq("user_id"), "inner")
      .select(col("o_orderkey"), col("user_sk"),
        col("o_totalprice"), runTsCol.as("inserted_at"))
    val newRows = Storage.currentVersion(l.factOrders) match {
      case Some(_) =>
        val existingKeys = Storage.readPartitionedVersion(spark, l.factOrders)
          .select(col("o_orderkey"))
        resolved.join(existingKeys, Seq("o_orderkey"), "left_anti")
      case None => resolved
    }
    // runTs identifies the run, so its load_epoch partition must be fresh:
    // committing NEW rows into an epoch that already exists would REPLACE
    // that partition's bytes (dynamic-overwrite semantics) and silently
    // drop the earlier run's facts. An exact re-run (same asOf, same
    // runTs) is still fine — its delta is empty, nothing is written.
    // The guard's epoch comes from Spark ITSELF (same cast, same session
    // timezone as the written column) — a driver-side parser could
    // disagree on a non-UTC session and fail open.
    val epoch = spark.range(1).select(unix_timestamp(runTsCol)).first().getLong(0)
    if (Storage.committedPartitions(l.factOrders).contains(s"load_epoch=$epoch") &&
        !newRows.isEmpty)
      throw new IllegalStateException(
        s"fact load_epoch=$epoch already committed with different content — " +
          "each run needs a distinct runTs (or re-run with identical asOf)")
    Storage.commitPartitions(
      newRows.withColumn("load_epoch", lit(epoch)),
      l.factOrders, "load_epoch")
  }

  /** What one [[maintain]] pass did: per-layer compaction outcome (None =
    * healthy, judged from log metadata alone), the fact table's version
    * after TTL expiry (None = no fact table yet or nothing due), and the
    * roll-forward result of every maintained aggregate view. */
  final case class MaintenanceReport(
      compacted: Map[String, Option[Int]], expiredFactVersion: Option[Long],
      views: Map[String, graft.ops.MatViews.MaintainResult] = Map.empty)

  /** The aggregate views of one base table, for [[maintain]]'s view pass
    * ([[graft.ops.MatViews.maintainAll]] — views lagging at the same base
    * version share one change feed). */
  final case class ViewMaintenance(base: Path, pk: Seq[String],
      specs: Seq[graft.ops.MatViews.ViewSpec])

  /** Scheduled maintenance — the pass an orchestrator runs after (or
    * beside) [[run]], in the same slot the reference gives Airflow's
    * cleanup DAGs. Two metadata-judged operations, each a no-op unless it
    * earns its keep:
    *
    *  - auto-OPTIMIZE every layer via [[Storage.maybeCompact]]: the
    *    trigger reads ONLY the current commit's Delta-log add sizes, so a
    *    healthy table costs one small JSON read — safe to schedule after
    *    every run. Convergent by construction (the manifested bucket
    *    floor), so back-to-back passes never rewrite twice.
    *  - TTL retention on the fact table via [[Storage.expireParts]]:
    *    `keepEpoch` judges each `load_epoch` partition; dropping a month
    *    of runs is O(dropped) manifest entries — the expired bytes are
    *    never opened, and downstream change-feed consumers see ordinary
    *    deletes.
    *
    *  - roll every registered aggregate view forward ([[ViewMaintenance]]
    *    → [[graft.ops.MatViews.maintainAll]]) — deliberately LAST, so the
    *    markers land on the post-compaction, post-TTL base versions and
    *    transparent rewrites stay live through maintenance; per view the
    *    cost is O(changed buckets + touched groups).
    *
    * At 100 TB this split is the point: [[run]] touches O(delta) data,
    * maintain touches O(metadata) unless compaction genuinely pays. */
  def maintain(spark: SparkSession, workDir: Path,
      keepEpoch: Long => Boolean = _ => true,
      targetBytes: Long = 128L << 20, maxSmallFiles: Int = 16,
      views: Seq[ViewMaintenance] = Nil): MaintenanceReport = {
    val l = layers(workDir)
    val compacted = Seq(
      "stg_users" -> l.stgUsers,
      "dim_users" -> l.dimUsers,
      "fact_orders" -> l.factOrders).map { case (name, p) =>
      name -> Storage.maybeCompact(spark, p, targetBytes, maxSmallFiles)
    }.toMap
    val expired = Storage.currentVersion(l.factOrders).map { cur =>
      def keep(part: String): Boolean = part.split("=", 2) match {
        case Array("load_epoch", v) => keepEpoch(v.toLong)
        case _ => true // never expire a partition we can't parse
      }
      if (Storage.committedPartitions(l.factOrders).forall(keep)) cur // no-op
      else Storage.expireParts(spark, l.factOrders, keep)
    }
    val viewResults = views.flatMap { vm =>
      graft.ops.MatViews.maintainAll(spark, vm.base, vm.pk, vm.specs)
        .zip(vm.specs).map { case (r, sp) => sp.view.toString -> r }
    }.toMap
    MaintenanceReport(compacted, expired, viewResults)
  }
}

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
  * Every table write is [[Storage.commitVersion]] — the BEGIN/COMMIT analog
  * (M4) as a versioned commit log: each run is one commit per layer,
  * concurrent readers keep their resolved snapshot, and the previous
  * run's state stays readable via [[Storage.readVersionAt]] until
  * vacuumed. Re-running with the same `asOf` is a no-op on every layer
  * (idempotence, verified in PipelineRunnerSpec).
  */
object PipelineRunner {

  final case class Layers(stgUsers: Path, dimUsers: Path, factOrders: Path)

  def layers(workDir: Path): Layers = Layers(
    workDir.resolve("stg_users"),
    workDir.resolve("dim_users"),
    workDir.resolve("fact_orders"))

  private def readOr(spark: SparkSession, p: Path, empty: => DataFrame): DataFrame =
    Storage.readVersionOr(spark, p, empty)

  /** One pipeline run: events/orders visible up to `asOf` (event-time and
    * order-date cutoffs), stamped with frozen `runTs`. */
  def run(spark: SparkSession, dir: String, workDir: Path,
      asOfEventTs: String, asOfOrderDate: String, runTs: String): Unit = {
    val l = layers(workDir)
    // single-writer startup: clear promoted-but-unpointed crash orphans so
    // this run's commits can't collide with them (Storage CAS contract)
    Seq(l.stgUsers, l.dimUsers, l.factOrders).foreach(Storage.repairOrphans)
    val runTsCol = lit(runTs).cast("timestamp")

    // ---- raw → stg: visible snapshot, conditional upsert (M1)
    val visible = Tables.events(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .filter(col("ts") <= lit(asOfEventTs).cast("timestamp"))
    val snapshot = MergeOps.latestByKey(visible, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_type"), col("value"),
        lit(null).cast("timestamp").as("loaded_at"),
        lit(null).cast("timestamp").as("last_upd_at"))
    val stgPrev = readOr(spark, l.stgUsers, snapshot.limit(0))
    val stgNext = MergeOps.conditionalUpsert(stgPrev, snapshot,
      Seq("user_id"), Seq("event_type", "value"), runTsCol)
    Storage.commitVersion(stgNext, l.stgUsers)

    // ---- stg → dwh dim: SCD2 close-and-insert (M3/M5)
    val stg = Storage.readVersion(spark, l.stgUsers)
      .select(col("user_id"), col("event_type"), col("value"))
    val dimPrev = readOr(spark, l.dimUsers,
      stg.limit(0)
        .withColumn("sk", lit(0L))
        .withColumn("valid_from", lit(null).cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true)))
    val dimNext = Scd2.closeAndInsert(dimPrev, stg, "user_id",
      Seq("event_type", "value"), runTsCol, "sk")
    Storage.commitVersion(dimNext, l.dimUsers)

    // ---- dwh fact: BK→SK resolution + incremental anti-join append (J2/J4)
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
    val factPrev = readOr(spark, l.factOrders, resolved.limit(0))
    val factNext = MergeOps.insertIfAbsent(factPrev, resolved, Seq("o_orderkey"))
    Storage.commitVersion(factNext, l.factOrders)
  }
}

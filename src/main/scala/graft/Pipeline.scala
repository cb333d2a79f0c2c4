package graft

import graft.ops.{Facts, MergeOps, Scd2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Flagship raw→stg→dwh pipeline (SURVEY.md §7.4): the reference's entire
  * load-bearing skeleton in one DAG-ordered flow.
  *
  *  raw:  orders wrapped as JSON payloads (the reference's raw layer stores
  *        the whole API JSON verbatim — configure.py:58-62)
  *  stg:  typed extraction P1-P4 from the payloads (stg_character.py:47-83)
  *  dwh:  SCD2 customer dimension (M3/M5) + incremental fact via BK→SK
  *        resolution and anti-join (J2/J4, dwh_fact_character_episode.py)
  *  mart: per-nation order rollup from the star
  */
object Pipeline {

  def run(spark: SparkSession, dir: String): DataFrame = {
    // ---- raw layer: schema-on-read JSON payloads, last-writer-wins by key
    val raw = Tables.orders(spark, dir).select(
      col("o_orderkey").as("source_id"),
      to_json(struct(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate").cast("string").as("o_orderdate"),
        col("o_orderpriority"))).as("payload"))
    // version by payload: versionCols must totally order each key group
    // (MergeOps contract) — versioning by the PK itself would compare all
    // duplicates equal and keep a partition-order-dependent row
    val rawDeduped = MergeOps.latestByKey(raw, Seq("source_id"), Seq(col("payload")))

    // ---- staging: typed extraction from JSON (P1-P4), ONE from_json parse
    // per payload (SURVEY §2.2 guidance; per-field get_json_object would
    // re-parse the payload five times)
    val stgSchema = "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE, o_orderdate STRING"
    val stgOrders = rawDeduped
      .select(from_json(col("payload"), org.apache.spark.sql.types.StructType.fromDDL(stgSchema)).as("j"))
      .select(
        col("j.o_orderkey").as("orderkey"),
        col("j.o_custkey").as("custkey"),
        col("j.o_orderstatus").as("status"),
        col("j.o_totalprice").as("totalprice"),
        to_timestamp(col("j.o_orderdate")).as("orderdate"))

    // ---- dwh: SCD2 customer dimension (single initial load → one current
    // version per key) with deterministic surrogate keys assigned by the
    // scalable two-phase shape — same keys as a global row_number
    // (hash-proven in m5b), no single-task sort even on a bulk load
    val dimCustomer = Scd2.withScalableSk(
        Tables.customer(spark, dir).select(
          col("c_custkey").cast("long").as("custkey"),
          col("c_name"), col("c_nationkey")),
        ordCols = Seq("custkey"), skCol = "customer_sk")
      .select(col("custkey"), col("c_name"), col("c_nationkey"), col("customer_sk"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("valid_from"),
        Scd2.infinity.as("valid_to"),
        lit(true).as("is_current"))

    // ---- fact: BK→SK resolution against current dim (J2, broadcast) then
    // incremental anti-join append into an empty fact (J4) — the same
    // Facts operators the oracle-checked queries exercise
    val resolved = Facts.resolveFk(
        stgOrders, dimCustomer.filter(col("is_current")),
        factKey = "custkey", dimBk = "custkey", dimSk = "customer_sk",
        carry = Seq("c_nationkey"))
      .select(col("orderkey"), col("customer_sk"), col("c_nationkey"),
        col("status"), col("totalprice"))
    val fact = Facts.incrementalAppend(resolved.limit(0), resolved, Seq("orderkey"))

    // ---- datamart: per-nation rollup
    fact.join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("totalprice").cast("decimal(14,2)")).cast("double").as("total_price"))
  }
}

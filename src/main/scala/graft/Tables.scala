package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At the
  * 100 TB design point these would be partitioned parquet/Delta directories;
  * the reader API is the same (`spark.read.parquet(dir)`), so nothing else
  * in the engine changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** Normalize the fixture's `ts` column to a zoned TIMESTAMP no matter
    * which physical encoding the generator produced:
    *   - parquet TIMESTAMP(NANOS) read as long under the session's
    *     `spark.sql.legacy.parquet.nanosAsLong=true` — integer `div` to
    *     micros (no double-precision loss), matching DuckDB's truncation;
    *   - plain `timestamp[us]` (no timezone), which Spark reads as
    *     TIMESTAMP_NTZ — cast to TIMESTAMP, a no-op reinterpretation under
    *     the UTC session;
    *   - an already-zoned TIMESTAMP — pass through.
    * Centralized here so every consumer (batch queries, streaming fixtures,
    * `unix_micros` call sites) is fixture-schema-proof. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

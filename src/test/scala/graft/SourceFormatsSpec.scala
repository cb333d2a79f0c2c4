package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink format coverage beyond parquet: the engine reads whatever
  * Spark reads, but CSV and JSON-lines have their own pitfalls (header
  * inference, null encoding, nested flattening) — these round-trips pin
  * lossless behavior with EXPLICIT schemas (inference is nondeterministic
  * under partitioning and banned by the engine's conventions).
  */
class SourceFormatsSpec extends SparkTestBase {

  private val schema = StructType.fromDDL(
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE, o_orderpriority STRING")

  private def sample = Tables.orders(spark, Sf001)
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderpriority"))
    // exercise the null-encoding path
    .withColumn("o_orderpriority",
      when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderpriority")))

  test("CSV round-trip with explicit schema is lossless incl. nulls") {
    val dir = Files.createTempDirectory("csv_rt").toString
    val src = sample
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
  }

  test("JSON-lines round-trip with explicit schema is lossless") {
    val dir = Files.createTempDirectory("json_rt").toString
    val src = sample
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
  }

  test("ORC round-trip is lossless and pushes filters to the scan") {
    val dir = Files.createTempDirectory("orc_rt").toString
    val src = sample
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
    // columnar parity with parquet: predicate reaches the ORC scan
    val plan = back.filter(col("o_orderkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)"),
      s"no ORC pushdown in:\n$plan")
  }
}

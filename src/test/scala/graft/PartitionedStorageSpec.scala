package graft

import java.nio.file.Files

import graft.ops.Storage
import org.apache.spark.sql.functions._

class PartitionedStorageSpec extends SparkTestBase {

  test("partitioned layout: filters become partition pruning; dynamic overwrite is incremental") {
    val dir = Files.createTempDirectory("part_storage").resolve("orders")
    val orders = Tables.orders(spark, Sf001)
      .withColumn("order_year", year(col("o_orderdate")))
    Storage.writePartitioned(orders, dir, Seq("order_year"))

    // filter on the partition column → PartitionFilters in the scan, and
    // only the matching directory is read
    val q = spark.read.parquet(dir.toString).filter(col("order_year") === 1997)
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(order_year"), scan)
    assert(q.count() ==
      orders.filter(col("order_year") === 1997).count())

    // dynamic overwrite: rewriting ONE year leaves the others untouched
    val patched = orders.filter(col("order_year") === 1997)
      .withColumn("o_orderpriority", lit("0-PATCHED"))
    Storage.writePartitioned(patched, dir, Seq("order_year"))
    val after = spark.read.parquet(dir.toString)
    assert(after.count() == orders.count(), "other partitions must survive")
    assert(after.filter(col("order_year") === 1997)
      .filter(col("o_orderpriority") =!= "0-PATCHED").count() == 0)
    assert(after.filter(col("order_year") =!= 1997)
      .filter(col("o_orderpriority") === "0-PATCHED").count() == 0)
  }

  test("atomicReplace recovers a swap interrupted between its two moves") {
    import java.nio.file.{Files => F, StandardCopyOption}
    val work = Files.createTempDirectory("swap_recovery")
    val table = work.resolve("t")
    val v1 = Tables.nation(spark, Sf001)
    Storage.atomicReplace(v1, table)
    // simulate a crash in the swap window: table moved aside, new never landed
    F.move(table, work.resolve("t.old"), StandardCopyOption.ATOMIC_MOVE)
    assert(!F.exists(table) && F.exists(work.resolve("t.old")))
    // read() rolls back to the old state instead of path-not-found
    assert(Storage.read(spark, table).count() == v1.count())
    // and a subsequent replace proceeds normally
    Storage.atomicReplace(v1.limit(3), table)
    assert(Storage.read(spark, table).count() == 3)
  }
}

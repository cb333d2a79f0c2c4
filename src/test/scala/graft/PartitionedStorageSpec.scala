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

  test("commit log: reader during a commit keeps a valid snapshot; no missing-path window") {
    import java.nio.file.{Files => F}
    val table = Files.createTempDirectory("commit_log").resolve("t")
    val nation = Tables.nation(spark, Sf001)

    assert(Storage.currentVersion(table).isEmpty)
    assert(Storage.readVersionOr(spark, table, nation.limit(0)).count() == 0)

    val v0 = Storage.commitVersion(nation, table)
    assert(v0 == 0 && Storage.currentVersion(table).contains(0L))

    // an in-flight reader resolves its directory BEFORE the next commit...
    val pinned = Storage.readVersion(spark, table)
    val v1 = Storage.commitVersion(nation.limit(5), table)
    assert(v1 == 1)
    // ...and still reads the OLD complete snapshot afterwards (v0 is inside
    // the keep-window), while a fresh reader sees the new version. This is
    // exactly the isolation atomicReplace cannot give.
    assert(pinned.count() == nation.count())
    assert(Storage.readVersion(spark, table).count() == 5)

    // vacuum: a third commit pushes v0 out of keepVersions=1
    Storage.commitVersion(nation.limit(7), table)
    assert(!F.exists(table.resolve("v0")), "v0 should be vacuumed")
    assert(F.exists(table.resolve("v1")), "v1 stays for in-flight readers")

    // time travel inside the keep-window; vacuumed/future versions refuse
    assert(Storage.readVersionAt(spark, table, 1).count() == 5)
    intercept[IllegalArgumentException](Storage.readVersionAt(spark, table, 0))
    intercept[IllegalArgumentException](Storage.readVersionAt(spark, table, 9))

    // crash before the pointer swap = orphan directory; the pointer still
    // names the last complete version and the next commit reuses the slot
    val orphan = table.resolve("v3")
    F.createDirectories(orphan)
    F.write(orphan.resolve("junk"), "torn".getBytes)
    assert(Storage.readVersion(spark, table).count() == 7)
    val v3 = Storage.commitVersion(nation.limit(9), table)
    assert(v3 == 3 && Storage.readVersion(spark, table).count() == 9)
  }

  test("commit log: schema evolves across versions; time travel returns each version's own schema") {
    import spark.implicits._
    val table = Files.createTempDirectory("schema_evo").resolve("t")
    Storage.commitVersion(Seq((1L, "a")).toDF("id", "name"), table, keepVersions = 2)
    // v1 adds a column — a new immutable version dir, so no merge problem
    Storage.commitVersion(Seq((1L, "a", 0.5)).toDF("id", "name", "score"), table, keepVersions = 2)
    assert(Storage.readVersion(spark, table).columns.toSeq == Seq("id", "name", "score"))
    assert(Storage.readVersionAt(spark, table, 0).columns.toSeq == Seq("id", "name"))
  }

  test("readVersionOr refuses a flat (non-versioned) table instead of silently rebuilding") {
    val table = Files.createTempDirectory("flat_guard").resolve("t")
    val nation = Tables.nation(spark, Sf001)
    Storage.atomicReplace(nation, table) // legacy flat layout
    intercept[IllegalArgumentException] {
      Storage.readVersionOr(spark, table, nation.limit(0))
    }
  }

  test("compact on a versioned table commits a compacted version; layout intact") {
    import java.nio.file.{Files => F}
    val table = Files.createTempDirectory("compact_versioned").resolve("t")
    val orders = Tables.orders(spark, Sf001)
    Storage.commitVersion(orders.repartition(16), table)
    val n = Storage.compact(spark, table, targetBytes = 1L << 30)
    assert(n == 1)
    assert(Storage.currentVersion(table).contains(1L), "compaction is commit v1")
    assert(Storage.readVersion(spark, table).count() == orders.count())
    assert(F.exists(table.resolve("_LATEST")))
  }

  test("compact: many small files collapse to the byte-targeted count, rows intact") {
    import java.nio.file.{Files => F}
    val table = Files.createTempDirectory("compaction").resolve("t")
    val orders = Tables.orders(spark, Sf001)
    Storage.atomicReplace(orders.repartition(16), table)
    def parquetFiles() = {
      val s = F.list(table)
      try s.toArray.map(_.toString).count(_.endsWith(".parquet")) finally s.close()
    }
    assert(parquetFiles() == 16)
    val n = Storage.compact(spark, table, targetBytes = 1L << 30)
    assert(n == 1 && parquetFiles() == 1, "tiny table must compact to one file")
    assert(Storage.read(spark, table).count() == orders.count())
  }
}

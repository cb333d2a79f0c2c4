package graft

import java.nio.file.Files

import graft.ops.{MergeOps, Storage}
import org.apache.spark.sql.functions._

/** RESTORE: metadata-only rollback of a partition-manifested table — the
  * restored version re-pins the target's manifest/DV/geometry and writes
  * no data. */
class RestoreSpec extends SparkTestBase {

  private def load(table: java.nio.file.Path, rows: Seq[(Long, String)],
      nParts: Int = 4): Long = {
    import spark.implicits._
    MergeOps.prunedConditionalUpsert(table,
      rows.toDF("user_id", "attr")
        .withColumn("loaded_at", lit(null).cast("timestamp"))
        .withColumn("last_upd_at", lit(null).cast("timestamp")),
      pk = Seq("user_id"), tracked = Seq("attr"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
      nParts = nParts, keepVersions = 8)
  }

  private def state(table: java.nio.file.Path): Map[Long, String] =
    Storage.readPartitionedVersion(spark, table)
      .select("user_id", "attr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("restore re-pins the old manifest: state equals time travel, zero data written, history preserved") {
    val table = Files.createTempDirectory("restore").resolve("t")
    load(table, Seq(1L -> "a", 2L -> "b", 3L -> "c"))       // v0
    load(table, Seq(2L -> "B2", 9L -> "new"))               // v1
    assert(state(table) == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))

    val rv = Storage.restore(spark, table, 0L, keepVersions = 8)
    assert(rv == 2L, s"restore must be a NEW commit, got v$rv")
    assert(Storage.currentVersion(table).contains(2L))
    assert(state(table) == Map(1L -> "a", 2L -> "b", 3L -> "c"),
      "restored state must equal the target version's")

    // METADATA-ONLY: the restore version dir holds no partition data dirs
    val s = Files.list(table.resolve("v2"))
    val dataDirs =
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(_.startsWith("pbucket=")).toSeq
      finally s.close()
    assert(dataDirs.isEmpty, s"restore must write no data, found $dataDirs")
    // ...its manifest IS v0's
    assert(Storage.readPartsManifest(table.resolve("v2")) ==
      Storage.readPartsManifest(table.resolve("v0")))

    // history is preserved: the rolled-back v1 still time-travels
    val at1 = Storage.readPartitionedVersionAt(spark, table, 1L)
      .select("user_id", "attr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at1 == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))

    // the change feed across the restore shows the logical UNDO
    val cdf = graft.ops.Cdc.changeDataFeed(spark, table, 1L, 2L,
      pk = Seq("user_id"), compareCols = Seq("attr"))
      .select("user_id", "change_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cdf == Map(2L -> "update", 9L -> "delete"), cdf.toString)

    // external readers follow: the table-level Delta log replays to the
    // restored state
    val ext = graft.ops.DeltaInterop.readTableSnapshot(spark, table)
      .select("user_id", "attr").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ext == Map(1L -> "a", 2L -> "b", 3L -> "c"), ext.toString)

    // restoring to the current version is a no-op
    assert(Storage.restore(spark, table, 2L, keepVersions = 8) == 2L)

    // a later load builds on the restored state normally
    load(table, Seq(3L -> "C3"))
    assert(state(table) == Map(1L -> "a", 2L -> "b", 3L -> "C3"))
  }

  test("restore resurrects the target's deletion vector; restoring past a delete undoes it") {
    import spark.implicits._
    val table = Files.createTempDirectory("restore_dv").resolve("t")
    load(table, Seq(1L -> "a", 2L -> "b", 3L -> "c"))       // v0
    MergeOps.deleteWithVectors(table, Seq(2L).toDF("user_id"),
      pk = Seq("user_id"), nParts = 4, keepVersions = 8)     // v1: DV tombstone
    assert(state(table) == Map(1L -> "a", 3L -> "c"))

    // restore PAST the delete: the row is back (fat-finger undo)
    Storage.restore(spark, table, 0L, keepVersions = 8)      // v2
    assert(state(table) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(Storage.deletionVector(table).isEmpty, "v0 had no DV")

    // restore FORWARD to the deleted state: the tombstone rides along
    Storage.restore(spark, table, 1L, keepVersions = 8)      // v3
    assert(state(table) == Map(1L -> "a", 3L -> "c"))
    assert(Storage.deletionVector(table).nonEmpty,
      "the restored version must carry v1's deletion vector")
    // still zero data dirs in the restore version
    val s = Files.list(table.resolve("v3"))
    try assert(!s.toArray.map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .exists(_.startsWith("pbucket=")))
    finally s.close()
  }

  test("restore carries the target's bucket geometry across a rebucket") {
    val table = Files.createTempDirectory("restore_geo").resolve("t")
    load(table, Seq(1L -> "a", 2L -> "b", 3L -> "c"), nParts = 4)  // v0 @ 4 buckets
    Storage.rebucket(spark, table, pk = Seq("user_id"), newN = 8,
      keepVersions = 8)                                            // v1 @ 8 buckets
    assert(Storage.declaredGeometry(table).contains(8))
    Storage.restore(spark, table, 0L, keepVersions = 8)            // v2 @ 4 again
    assert(Storage.declaredGeometry(table).contains(4),
      "restore must resurrect the target's geometry marker")
    // pruned writes against the restored layout use the restored geometry
    load(table, Seq(2L -> "B2"), nParts = 4)
    assert(state(table) == Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }
}

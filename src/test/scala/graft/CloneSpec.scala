package graft

import java.nio.file.Files

import graft.ops.{MergeOps, Storage}
import org.apache.spark.sql.functions._

/** Shallow clone: metadata-only v0 referencing the source's bytes by
  * absolute-URI Delta adds; copy-on-first-write independence; vacuum pin
  * lifecycle at the source. */
class CloneSpec extends SparkTestBase {

  private def seed(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
  }

  private def parquetFilesUnder(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.walk(dir)
    try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
    finally s.close()
  }

  test("clone v0 is metadata-only and reads byte-equal to the source") {
    val src = Files.createTempDirectory("clone_src")
    val dst = Files.createTempDirectory("clone_dst_ro")
    Files.delete(dst)
    Storage.commitVersion(seed(100), src)
    val v = Storage.cloneTable(spark, src, dst)
    assert(v == 0L)
    // zero data bytes under the clone's version dir — the whole point
    assert(parquetFilesUnder(dst.resolve("v0")).isEmpty)
    val got = Storage.readVersion(spark, dst).orderBy("k").collect().map(_.getString(1))
    val want = Storage.readVersion(spark, src).orderBy("k").collect().map(_.getString(1))
    assert(got.toSeq == want.toSeq)
  }

  test("clone evolves independently; source never sees clone writes") {
    val src = Files.createTempDirectory("clone_src2")
    val dst = Files.createTempDirectory("clone_dst2")
    Files.delete(dst)
    Storage.commitVersion(seed(50), src)
    Storage.cloneTable(spark, src, dst)
    // first own commit of the clone: full replace, drops all src references
    val next = Storage.readVersion(spark, dst).filter(col("k") <= 10)
    Storage.commitVersion(next, dst)
    assert(Storage.readVersion(spark, dst).count() == 10)
    assert(Storage.readVersion(spark, src).count() == 50)
    // and the rewritten clone owns real bytes
    assert(parquetFilesUnder(dst.resolve("v1")).nonEmpty)
    // source advancing does not disturb the rewritten clone
    Storage.commitVersion(seed(7), src)
    assert(Storage.readVersion(spark, dst).count() == 10)
  }

  test("pin protects the cloned source version from vacuum; releases when clone v0 dies") {
    val src = Files.createTempDirectory("clone_src3")
    val dst = Files.createTempDirectory("clone_dst3")
    Files.delete(dst)
    Storage.commitVersion(seed(20), src) // src v0
    Storage.cloneTable(spark, src, dst)  // pins src v0
    assert(Storage.pinnedVersions(src) == Set(0L))
    // advance src twice with keepVersions=1 — v0 would normally be swept
    Storage.commitVersion(seed(21), src) // v1
    Storage.commitVersion(seed(22), src) // v2; unpinned v0 would vacuum here
    assert(Files.exists(src.resolve("v0")), "pinned source version must survive vacuum")
    // the unrewritten clone still reads the ORIGINAL snapshot
    assert(Storage.readVersion(spark, dst).count() == 20)
    // rewrite the clone twice: its v0 (holding the provenance) vacuums,
    // which releases the pin at src
    Storage.commitVersion(seed(5), dst)  // clone v1 (v0 retained by keep=1)
    Storage.commitVersion(seed(6), dst)  // clone v2 → v0 swept → pin released
    assert(Storage.pinnedVersions(src).isEmpty, "pin must release with clone v0")
    // now src vacuum may reclaim its v0
    Storage.commitVersion(seed(23), src)
    assert(!Files.exists(src.resolve("v0")))
  }

  test("clone of a DV-carrying partitioned table serves post-delete rows") {
    val src = Files.createTempDirectory("clone_src4")
    val dst = Files.createTempDirectory("clone_dst4")
    Files.delete(dst)
    import spark.implicits._
    val base = (1 to 40).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    MergeOps.prunedConditionalUpsert(src, base, pk = Seq("id"),
      tracked = Seq("payload"), runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
      nParts = 4)
    val doomed = Seq(3L, 7L, 21L).toDF("id")
    MergeOps.deleteWithVectors(src, doomed, pk = Seq("id"), nParts = 4)
    Storage.cloneTable(spark, src, dst)
    val ids = Storage.readVersion(spark, dst).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (1 to 40).map(_.toLong).toSet -- Set(3L, 7L, 21L))
  }

  test("compacting a clone materializes it and auto-releases the pin") {
    val src = Files.createTempDirectory("clone_src5")
    val dst = Files.createTempDirectory("clone_dst5")
    Files.delete(dst)
    Storage.commitVersion(seed(30), src)
    Storage.cloneTable(spark, src, dst)
    assert(Storage.pinnedVersions(src).size == 1)
    Storage.compact(spark, dst) // materialization: clone v1 owns its bytes
    assert(parquetFilesUnder(dst.resolve("v1")).nonEmpty)
    Storage.commitVersion(Storage.readVersion(spark, dst), dst) // v2 → v0 swept
    assert(Storage.pinnedVersions(src).isEmpty)
    assert(Storage.readVersion(spark, dst).count() == 30)
  }

  test("cloning onto an existing table fails loudly") {
    val src = Files.createTempDirectory("clone_src6")
    val dst = Files.createTempDirectory("clone_dst6")
    Files.delete(dst)
    Storage.commitVersion(seed(3), src)
    Storage.cloneTable(spark, src, dst)
    intercept[IllegalArgumentException] {
      Storage.cloneTable(spark, src, dst)
    }
    // the failed attempt must not leak a second pin
    assert(Storage.pinnedVersions(src).size == 1)
  }
}

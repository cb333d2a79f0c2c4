package graft

import java.nio.file.{Files, Path}

import graft.ops.{Scd2, Storage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** prunedCloseAndInsert must be the SAME dimension as the full-rewrite
  * path — surrogate keys included — while only touching the buckets the
  * load's business keys hash into.
  */
class Scd2PrunedSpec extends SparkTestBase {
  import spark.implicits._

  private def stg(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("user_id", "plan")

  private def ts(s: String) = lit(s).cast("timestamp")

  test("pruned SCD2 ≡ full close-and-insert across three loads; untouched buckets byte-identical") {
    val table = Files.createTempDirectory("scd2_pruned").resolve("dim")

    val load1 = stg((0L until 60L).map(i => i -> s"plan${i % 3}"))
    val load2 = stg(Seq(1L -> "plan9", 31L -> "plan9", 999L -> "new"))
    val load3 = stg(Seq(1L -> "plan10"))
    val runTs = Seq(ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"), ts("2024-03-01 00:00:00"))

    // reference: plain full-rewrite path
    var full = Scd2.emptyDim(load1, "user_id", Seq("plan"))
    Seq(load1, load2, load3).zip(runTs).foreach { case (l, t) =>
      full = Scd2.closeAndInsert(full, l, "user_id", Seq("plan"), t)
        .localCheckpoint()
    }

    def dataFiles(p: Path): Map[String, Seq[Byte]] = {
      val s = java.nio.file.Files.walk(p)
      try s.toArray.map(_.asInstanceOf[Path])
        .filter(f => f.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(f))
        .map(f => p.relativize(f).toString -> java.nio.file.Files.readAllBytes(f).toSeq)
        .toMap
      finally s.close()
    }

    Scd2.prunedCloseAndInsert(table, load1, "user_id", Seq("plan"), runTs(0), nParts = 8)
    val v0Files = dataFiles(table.resolve("v0"))

    Scd2.prunedCloseAndInsert(table, load2, "user_id", Seq("plan"), runTs(1), nParts = 8)
    // load 2 touches ≤ 3 buckets of 8; every untouched v0 file is unmoved
    assert(dataFiles(table.resolve("v0")) == v0Files,
      "untouched v0 buckets must stay byte-identical")
    val s1 = java.nio.file.Files.list(table.resolve("v1"))
    val rewritten =
      try s1.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .count(_.startsWith("pbucket="))
      finally s1.close()
    assert(rewritten <= 3, s"load 2 (3 keys) must rewrite <= 3 buckets, rewrote $rewritten")

    Scd2.prunedCloseAndInsert(table, load3, "user_id", Seq("plan"), runTs(2), nParts = 8)

    // re-delivering an identical load changes nothing and rewrites NOTHING
    val beforeRedeliver = Storage.readPartitionedVersion(spark, table)
      .drop("pbucket").collect().map(_.toString).sorted.toSeq
    Scd2.prunedCloseAndInsert(table, load3, "user_id", Seq("plan"),
      ts("2024-04-01 00:00:00"), nParts = 8)
    val vLatest = Storage.currentVersion(table).get
    val sL = java.nio.file.Files.list(table.resolve(s"v$vLatest"))
    val redelivered =
      try sL.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .count(_.startsWith("pbucket="))
      finally sL.close()
    assert(redelivered == 0, "identical re-delivery must rewrite zero buckets")
    assert(Storage.readPartitionedVersion(spark, table)
      .drop("pbucket").collect().map(_.toString).sorted.toSeq == beforeRedeliver)

    // composed pruned state == full-rewrite state, SKs included
    val got = Storage.readPartitionedVersion(spark, table).drop("pbucket")
      .select(full.columns.map(col).toIndexedSeq: _*)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty,
      "pruned dimension must equal the full-rewrite dimension")
    // SCD2 invariants on the pruned state
    assert(got.filter(col("is_current")).groupBy("user_id").count()
      .filter(col("count") =!= 1).count() == 0)
    assert(got.filter(col("user_id") === 1L).count() == 3, "user 1 has 3 versions")
    val sks = got.select("sk").collect().map(_.getLong(0))
    assert(sks.distinct.length == sks.length, "SKs unique across buckets")
  }
}

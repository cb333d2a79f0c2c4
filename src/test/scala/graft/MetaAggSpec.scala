package graft

import java.nio.file.Files

import graft.ops.{MergeOps, MetaAgg, Storage}
import org.apache.spark.sql.functions._

/** Metadata-only aggregates: exactness AND the no-data-read guarantee —
  * the latter proven the strong way, by corrupting the parquet bytes the
  * metadata path must never open and watching the answers not change. */
class MetaAggSpec extends SparkTestBase {

  private def corrupt(file: java.nio.file.Path): Unit =
    Files.write(file, "NOT A PARQUET FILE".getBytes("UTF-8"))

  private def dataFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.walk(dir)
    try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
    finally s.close()
  }

  test("rowCount/columnRange answer from metadata alone — even after every data file is destroyed") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_flat").resolve("t")
    val df = (1L to 1000L).map(i => (i, i * 2.5, if (i % 10 == 0) null else s"s$i"))
      .toDF("k", "x", "s")
      .repartition(4)
    Storage.commitVersion(df, table)

    assert(MetaAgg.rowCount(table).contains(1000L))
    val kr = MetaAgg.columnRange(table, "k")
    assert(kr.contains(("i", "1", "1000")), kr.toString)
    val xr = MetaAgg.columnRange(table, "x")
    assert(xr.exists { case (t, mn, mx) =>
      t == "f" && mn.toDouble == 2.5 && mx.toDouble == 2500.0 }, xr.toString)

    // the proof: destroy every data file; the metadata path cannot notice
    dataFiles(table).foreach(corrupt)
    assert(MetaAgg.rowCount(table).contains(1000L), "rowCount read a data file")
    assert(MetaAgg.columnRange(table, "k").contains(("i", "1", "1000")),
      "columnRange read a data file")
  }

  test("columnRange refuses when a file could hide the extremum; all-null files are excluded by nullCount") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_nulls").resolve("t")
    // file A holds values 10..19, file B is ALL NULL for x: B must not
    // block the range (its nullCount proves it holds no values)
    val a = (10L to 19L).map(i => (i, Some(i * 1.0))).toDF("k", "x").coalesce(1)
    val b = (20L to 29L).map(i => (i, None: Option[Double])).toDF("k", "x").coalesce(1)
    Storage.commitVersion(a.unionByName(b).repartitionByRange(2, col("k")), table)
    val xr = MetaAgg.columnRange(table, "x")
    assert(xr.exists { case (t, mn, mx) =>
      t == "f" && mn.toDouble == 10.0 && mx.toDouble == 19.0 }, xr.toString)
    // k has values in every file and a full range
    assert(MetaAgg.columnRange(table, "k").contains(("i", "10", "29")))
  }

  test("countWhere scans ONLY boundary files: interior and exterior files can be garbage") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_range").resolve("t")
    // range-partitioned layout → per-file disjoint k ranges (the z-order/
    // cluster shape this is designed for); 8 files over 1..8000
    val df = (1L to 8000L).map(i => (i, if (i % 100 == 0) null else s"v$i"))
      .toDF("k", "s").repartitionByRange(8, col("k"))
    Storage.commitVersion(df, table)

    // predicate spanning files fully-inside plus two boundary files
    val expected = (1L to 8000L).count(i => i >= 1500 && i <= 6500)
    assert(MetaAgg.countWhere(spark, table, "k",
      BigDecimal(1500), BigDecimal(6500)) == expected)

    // identify the boundary files from the manifest's own stats and
    // corrupt EVERYTHING ELSE — the hybrid count must not notice
    val v = Storage.currentVersion(table).get
    val snap = graft.ops.DeltaInterop.readLog(
      graft.ops.DeltaInterop.logFile(table.resolve(s"v$v")))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val boundaryFiles = snap.adds.filter { ad =>
      val j = JsonMethods.parse(ad.stats.get)
      val mn = (j \ "minValues" \ "k") match { case JInt(n) => n.toLong; case JLong(n) => n; case _ => fail(s"no k min in ${ad.stats.get}") }
      val mx = (j \ "maxValues" \ "k") match { case JInt(n) => n.toLong; case JLong(n) => n; case _ => fail(s"no k max in ${ad.stats.get}") }
      val straddles = (mn < 1500 && mx >= 1500) || (mn <= 6500 && mx > 6500)
      straddles
    }.map(_.path).toSet
    assert(boundaryFiles.nonEmpty && boundaryFiles.size < snap.adds.size,
      s"fixture must produce both boundary and non-boundary files: $boundaryFiles")
    dataFiles(table).filterNot(f =>
      boundaryFiles.exists(b => f.toString.endsWith(b))).foreach(corrupt)
    assert(MetaAgg.countWhere(spark, table, "k",
      BigDecimal(1500), BigDecimal(6500)) == expected,
      "countWhere opened a non-boundary file")
  }

  test("countWhere subtracts nullCount exactly for fully-inside files") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_rangenull").resolve("t")
    // x is null on multiples of 7; the fully-inside files' contribution
    // must be numRecords − nullCount, not numRecords
    val df = (1L to 4000L).map(i => (i, if (i % 7 == 0) None else Some(i * 1.0)))
      .toDF("k", "x").repartitionByRange(4, col("k"))
    Storage.commitVersion(df, table)
    val expected = (1L to 4000L).count(i => i % 7 != 0 && i >= 500 && i <= 3500)
    // predicate on x (the nullable column) with bounds aligned to k-sorted
    // files: x == k as a double where non-null, so ranges coincide
    assert(MetaAgg.countWhere(spark, table, "x",
      BigDecimal(500), BigDecimal(3500)) == expected)
  }

  test("a live deletion vector makes stats untight: metadata refuses, the fallback stays exact") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_dv").resolve("t")
    val inc = (1L to 200L).map(i => (i, s"u$i")).toDF("user_id", "attr")
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    MergeOps.prunedConditionalUpsert(table, inc, pk = Seq("user_id"),
      tracked = Seq("attr"), runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
      nParts = 4, keepVersions = 4)
    assert(MetaAgg.rowCount(table).contains(200L))
    MergeOps.deleteWithVectors(table,
      Seq(3L, 5L).toDF("user_id"), pk = Seq("user_id"), nParts = 4, keepVersions = 4)
    // the DV descriptor's cardinality keeps the VISIBLE count exact from
    // metadata alone; min/max stay untight so columnRange still refuses
    assert(MetaAgg.rowCount(table).contains(198L),
      "visible count = numRecords − dv cardinality, still metadata-only")
    assert(MetaAgg.columnRange(table, "user_id").isEmpty)
    assert(MetaAgg.countWhere(spark, table, "user_id",
      BigDecimal(1), BigDecimal(200)) == 198L, "fallback must apply the DV")
  }

  test("readPruned: stats-driven file skipping for flat AND partitioned tables — pruned-away files can be garbage") {
    import spark.implicits._
    // flat, range-clustered: only the files overlapping [lo, hi] are read
    val flat = Files.createTempDirectory("meta_rp_flat").resolve("t")
    val rows = (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
    Storage.commitVersion(rows.repartitionByRange(8, col("k")), flat)
    def visible(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("k") >= 900 && col("k") <= 1100)
        .select("k").collect().map(_.getLong(0)).toSet
    val expect = (900L to 1100L).toSet
    assert(visible(MetaAgg.readPruned(spark, flat, "k",
      BigDecimal(900), BigDecimal(1100))) == expect)
    // corrupt every file fully OUTSIDE the range (identified from the
    // log's own stats): the pruned read must never open them
    val snap = graft.ops.DeltaInterop.readLog(
      graft.ops.DeltaInterop.logFile(flat.resolve("v0")))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def kRange(st: String): (Long, Long) = {
      val j = JsonMethods.parse(st)
      def n(v: JValue): Long = v match {
        case JInt(x) => x.toLong; case JLong(x) => x; case _ => fail(s"no k stat in $st")
      }
      (n(j \ "minValues" \ "k"), n(j \ "maxValues" \ "k"))
    }
    val doomed = snap.adds.filter { a =>
      val (mn, mx) = kRange(a.stats.get); mx < 900 || mn > 1100
    }.map(_.path)
    assert(doomed.nonEmpty, "fixture must have fully-outside files")
    doomed.foreach(p => corrupt(flat.resolve("v0").resolve(p)))
    assert(visible(MetaAgg.readPruned(spark, flat, "k",
      BigDecimal(900), BigDecimal(1100))) == expect,
      "readPruned opened a pruned-away file")

    // partitioned with carried buckets: stats prune works through the
    // carry chain (the carried adds keep their stats in the log)
    val part = Files.createTempDirectory("meta_rp_part").resolve("t")
    def commitBucket(b: Int, ks: Seq[Long]): Unit =
      Storage.commitPartitions(
        ks.map(k => (k, s"v$k", b)).toDF("k", "v", "pbucket"),
        part, "pbucket", keepVersions = 8)
    commitBucket(0, 1L to 100L)
    commitBucket(1, 101L to 200L) // bucket 0 carries from v0
    val pruned = MetaAgg.readPruned(spark, part, "k",
      BigDecimal(150), BigDecimal(160))
    assert(pruned.filter(col("k").between(150, 160))
      .select("k").collect().map(_.getLong(0)).toSet == (150L to 160L).toSet)
    // the carried bucket 0 is outside the range — corrupt it; only the
    // stats-overlapping file may be opened
    dataFiles(part.resolve("v0")).foreach(corrupt)
    assert(MetaAgg.readPruned(spark, part, "k",
      BigDecimal(150), BigDecimal(160))
      .filter(col("k").between(150, 160))
      .select("k").collect().map(_.getLong(0)).toSet == (150L to 160L).toSet,
      "readPruned opened a carried out-of-range file")
  }

  test("readPrunedWhere: string-typed and conjunctive multi-column pruning, pruned files can be garbage") {
    import spark.implicits._
    import graft.ops.MetaAgg.{NumRange, StrRange}
    val table = Files.createTempDirectory("meta_rpw").resolve("t")
    // s is zero-padded so lexicographic order == numeric order, and the
    // range-cluster on k co-clusters s — the z-order-lite fixture
    val rows = (1L to 4000L).map(i => (i, f"s$i%05d")).toDF("k", "s")
    Storage.commitVersion(rows.repartitionByRange(8, col("k")), table)
    val expect = (900L to 1100L).toSet
    def visible(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("s") >= "s00900" && col("s") <= "s01100")
        .select("k").collect().map(_.getLong(0)).toSet

    // string-typed pruning answers exactly...
    assert(visible(MetaAgg.readPrunedWhere(spark, table,
      Seq(StrRange("s", "s00900", "s01100")))) == expect)
    // ...and never opens a file whose s-range is fully outside: corrupt
    // them all (identified from the log's own stats)
    val snap = graft.ops.DeltaInterop.readLog(
      graft.ops.DeltaInterop.logFile(table.resolve("v0")))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def sRange(st: String): (String, String) = {
      val j = JsonMethods.parse(st)
      def v(x: JValue): String = x match {
        case JString(s) => s; case _ => fail(s"no s stat in $st")
      }
      (v(j \ "minValues" \ "s"), v(j \ "maxValues" \ "s"))
    }
    val doomed = snap.adds.filter { a =>
      val (mn, mx) = sRange(a.stats.get); mx < "s00900" || mn > "s01100"
    }.map(_.path)
    assert(doomed.nonEmpty, "fixture must have fully-outside files")
    doomed.foreach(p => corrupt(table.resolve("v0").resolve(p)))
    assert(visible(MetaAgg.readPrunedWhere(spark, table,
      Seq(StrRange("s", "s00900", "s01100")))) == expect,
      "string pruning opened a pruned-away file")

    // conjunctive: numeric AND string ranges prune together (file kept
    // only when BOTH can match) and the result stays exact
    assert(visible(MetaAgg.readPrunedWhere(spark, table,
      Seq(NumRange("k", BigDecimal(900), BigDecimal(1100)),
        StrRange("s", "s00900", "s01100")))) == expect)
    // a contradictory conjunction prunes everything without a scan
    assert(MetaAgg.readPrunedWhere(spark, table,
      Seq(NumRange("k", BigDecimal(900), BigDecimal(1100)),
        StrRange("s", "s03900", "s03999"))).count() == 0)
  }

  test("maybeCompact: the auto-OPTIMIZE trigger judges file health from log metadata alone") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_autocompact").resolve("t")
    val rows = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    // a healthy layout (2 files) never triggers — and the no-op must not
    // burn a version slot
    Storage.commitVersion(rows.repartition(2), table, keepVersions = 4)
    assert(Storage.maybeCompact(spark, table, maxSmallFiles = 4).isEmpty)
    assert(Storage.currentVersion(table).contains(0L), "no-op must not commit")
    // a fragmented rewrite (8 tiny files) crosses the threshold: the
    // policy fires from the log's add sizes alone and commits the rewrite
    Storage.commitVersion(rows.repartition(8), table, keepVersions = 4)
    assert(Storage.maybeCompact(spark, table, maxSmallFiles = 4).nonEmpty)
    val vAfter = Storage.currentVersion(table).get
    assert(vAfter == 2L, s"compaction must land as a new commit, got v$vAfter")
    assert(Storage.readVersion(spark, table).count() == 1000L)
    // the freshly compacted table is healthy again
    assert(Storage.maybeCompact(spark, table, maxSmallFiles = 4).isEmpty)
    assert(Storage.currentVersion(table).contains(2L))
  }

  test("maybeCompact converges on partition-manifested tables: the bucket floor stops rewrite loops") {
    import spark.implicits._
    // the defect geometry: bucket count ABOVE maxSmallFiles on a healthy
    // one-file-per-bucket layout — the raw small-file count (8 > 4) used
    // to trigger a full-table rewrite on EVERY scheduled call, forever,
    // because compaction can never go below one file per partition
    val healthy = Files.createTempDirectory("meta_partfloor").resolve("t")
    val rows8 = (1L to 400L).map(i => (i, s"v$i", (i % 8).toInt)).toDF("k", "v", "pbucket")
    Storage.commitPartitions(rows8.repartition(8, col("pbucket")),
      healthy, "pbucket", keepVersions = 8)
    val v0 = Storage.currentVersion(healthy).get
    assert(Storage.maybeCompact(spark, healthy, maxSmallFiles = 4).isEmpty,
      "a one-file-per-bucket layout is the manifested floor — no rewrite")
    assert(Storage.currentVersion(healthy).contains(v0), "no-op must not commit")

    // genuinely fragmented (many files per bucket): compacts ONCE, then
    // the very next scheduled call is a no-op — convergence
    val frag = Files.createTempDirectory("meta_partfrag").resolve("t")
    val rows4 = (1L to 400L).map(i => (i, s"v$i", (i % 4).toInt)).toDF("k", "v", "pbucket")
    Storage.commitPartitions(rows4.repartition(16, col("pbucket"), col("k")),
      frag, "pbucket", keepVersions = 8)
    assert(Storage.maybeCompact(spark, frag, maxSmallFiles = 4).nonEmpty,
      "a multi-file-per-bucket layout above the floor must compact")
    val vAfter = Storage.currentVersion(frag).get
    assert(Storage.maybeCompact(spark, frag, maxSmallFiles = 4).isEmpty,
      "the second scheduled call must converge to a no-op")
    assert(Storage.currentVersion(frag).contains(vAfter))
    assert(Storage.readPartitionedVersion(spark, frag).count() == 400L)
  }

  test("countWhere on a partition column falls back to the composed read instead of throwing") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_partcol").resolve("t")
    val rows = (1L to 400L).map(i => (i, s"v$i", (i % 4).toInt)).toDF("k", "v", "pbucket")
    Storage.commitPartitions(rows.repartition(4, col("pbucket")),
      table, "pbucket", keepVersions = 8)
    // pbucket's values are directory names — absent from every file's
    // footer stats AND from a raw path read; the fallback must compose
    // the partitioned read (basePath) and still answer exactly
    assert(MetaAgg.countWhere(spark, table, "pbucket",
      BigDecimal(1), BigDecimal(2)) == (1L to 400L).count(i => i % 4 == 1 || i % 4 == 2))
    // and a regular data column on the same table still takes the hybrid path
    assert(MetaAgg.countWhere(spark, table, "k",
      BigDecimal(10), BigDecimal(20)) == 11L)
  }

  test("history: per-version visible counts, own/carried partition ledger, tombstones — metadata only") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_hist").resolve("t")
    val load1 = (1L to 100L).map(i => (i, s"a$i")).toDF("user_id", "attr")
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    MergeOps.prunedConditionalUpsert(table, load1, pk = Seq("user_id"),
      tracked = Seq("attr"), runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
      nParts = 8, keepVersions = 8)
    val load2 = Seq((7L, "CHANGED"), (101L, "NEW")).toDF("user_id", "attr")
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    MergeOps.prunedConditionalUpsert(table, load2, pk = Seq("user_id"),
      tracked = Seq("attr"), runTs = lit("2024-01-02 00:00:00").cast("timestamp"),
      nParts = 8, keepVersions = 8)
    MergeOps.deleteWithVectors(table, Seq(9L).toDF("user_id"),
      pk = Seq("user_id"), nParts = 8, keepVersions = 8)

    val h = MetaAgg.history(spark, table)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(h.length == 3, h.mkString("; "))
    val (v0, v1, v2) = (h(0), h(1), h(2))
    assert(v0 == (0L, "partitioned", 100L, 8L, 0L, 0L), v0.toString)
    // load 2 (one update + one insert) touched at most 2 buckets;
    // everything else carried
    assert(v1._3 == 101L && v1._4 <= 2L && v1._4 + v1._5 == 8L, v1.toString)
    // the DV commit owns NO partitions — pure tombstone metadata
    assert(v2._3 == 100L && v2._4 == 0L && v2._5 == 8L && v2._6 == 1L,
      v2.toString)
  }

  test("partition-manifested tables: carried buckets' stats ride the log; a statless commit refuses") {
    import spark.implicits._
    val table = Files.createTempDirectory("meta_parts").resolve("t")
    val load1 = (1L to 160L).map(i => (i, s"a$i")).toDF("user_id", "attr")
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    MergeOps.prunedConditionalUpsert(table, load1, pk = Seq("user_id"),
      tracked = Seq("attr"), runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
      nParts = 8, keepVersions = 4)
    // second load rewrites a couple of buckets; the rest carry by reference
    val load2 = Seq((3L, "CHANGED"), (161L, "NEW")).toDF("user_id", "attr")
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    MergeOps.prunedConditionalUpsert(table, load2, pk = Seq("user_id"),
      tracked = Seq("attr"), runTs = lit("2024-01-02 00:00:00").cast("timestamp"),
      nParts = 8, keepVersions = 4)
    assert(MetaAgg.rowCount(table).contains(161L))
    assert(MetaAgg.columnRange(table, "user_id").contains(("i", "1", "161")))
    assert(MetaAgg.countWhere(spark, table, "user_id",
      BigDecimal(10), BigDecimal(20)) == 11L)

    // a fileStats=false commit writes statless adds → every answer refuses
    val table2 = Files.createTempDirectory("meta_nostats").resolve("t")
    MergeOps.prunedConditionalUpsert(table2, load1, pk = Seq("user_id"),
      tracked = Seq("attr"), runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
      nParts = 8, keepVersions = 4, fileStats = false)
    assert(MetaAgg.rowCount(table2).isEmpty)
    assert(MetaAgg.columnRange(table2, "user_id").isEmpty)
    assert(MetaAgg.countWhere(spark, table2, "user_id",
      BigDecimal(1), BigDecimal(160)) == 160L, "statless → full-scan fallback")
  }
}

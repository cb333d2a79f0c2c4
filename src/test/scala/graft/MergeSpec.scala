package graft

import graft.ops.{MergeOps, Storage}
import org.apache.spark.sql.functions._

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = "2024-01-01 00:00:00"
  private val t1 = "2024-02-01 00:00:00"

  private def stg(rows: (Int, String, String, String)*) =
    rows.toDF("id", "attr", "loaded_at", "last_upd_at")
      .select($"id", $"attr",
        $"loaded_at".cast("timestamp").as("loaded_at"),
        $"last_upd_at".cast("timestamp").as("last_upd_at"))

  test("M1: conditionalUpsert — insert / changed / unchanged semantics") {
    val old = stg((1, "a", t0, t0), (2, "b", t0, t0), (3, "c", t0, t0))
    val incoming = stg((2, "b", t1, t1), (3, "CHANGED", t1, t1), (4, "new", t1, t1))
    val out = MergeOps.conditionalUpsert(old, incoming, Seq("id"), Seq("attr"),
        lit(t1).cast("timestamp"))
      .select($"id", $"attr", $"loaded_at".cast("string"), $"last_upd_at".cast("string"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1, "a", t0, t0),          // absent from incoming → untouched
      (2, "b", t0, t0),          // present, unchanged → last_upd NOT bumped
      (3, "CHANGED", t0, t1),    // changed → loaded_at kept, last_upd bumped
      (4, "new", t1, t1)))       // inserted → both stamped with runTs
  }

  test("M1: re-running the same upsert is a no-op (idempotent)") {
    val old = stg((1, "a", t0, t0), (2, "b", t0, t0))
    val incoming = stg((2, "B2", t1, t1))
    val once = MergeOps.conditionalUpsert(old, incoming, Seq("id"), Seq("attr"),
      lit(t1).cast("timestamp"))
    val twice = MergeOps.conditionalUpsert(once, incoming, Seq("id"), Seq("attr"),
      lit("2024-03-01 00:00:00").cast("timestamp"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("M2: insertIfAbsent appends only new PKs and dedups the batch") {
    val existing = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val incoming = Seq((2, "X"), (3, "c"), (3, "c2")).toDF("id", "v")
    val out = MergeOps.insertIfAbsent(existing, incoming, Seq("id"))
    assert(out.count() == 3)
    assert(out.filter($"id" === 2).head().getString(1) == "b") // existing wins
    // re-run: nothing new
    assert(MergeOps.insertIfAbsent(out, incoming, Seq("id")).count() == 3)
  }

  test("M2/M1: tieBreak makes duplicate-PK batches deterministic") {
    val existing = Seq((1, "a", 0)).toDF("id", "v", "ver")
    val incoming = Seq((3, "lo", 1), (3, "hi", 9), (3, "mid", 5)).toDF("id", "v", "ver")
    val out = MergeOps.insertIfAbsent(existing, incoming, Seq("id"), Seq(col("ver")))
    assert(out.filter($"id" === 3).head().getString(1) == "hi") // max by ver wins
    val up = MergeOps.conditionalUpsert(
      stg((1, "a", t0, t0)),
      stg((1, "z1", t1, t1), (1, "z2", t1, t1)).withColumn("ver", when($"attr" === "z2", 9).otherwise(1)),
      Seq("id"), Seq("attr"), lit(t1).cast("timestamp"), tieBreak = Seq(col("ver")))
    assert(up.filter($"id" === 1).head().getAs[String]("attr") == "z2")
  }

  test("S3: latestByKey keeps exactly the last row per key") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "ver", "v")
    val out = MergeOps.latestByKey(df, Seq("k"), Seq(col("ver")))
      .collect().map(r => (r.getInt(0), r.getString(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1, "new"), (2, "only")))
  }

  test("latestSnapshots: several conditional latests in one pass; NULL when none qualify") {
    val df = Seq((1, 1, "a"), (1, 5, "b"), (2, 2, "c"), (3, 9, "late"))
      .toDF("k", "ver", "v")
    val out = MergeOps.latestSnapshots(df, Seq("k"), Seq(col("ver")),
        Seq("cur" -> lit(true), "early" -> (col("ver") <= 2)))
      .select(col("k"), col("cur.v").as("cv"), col("early.v").as("ev"))
      .as[(Int, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "b", Some("a")), (2, "c", Some("c")), (3, "late", None)))
  }

  test("M1: a NULL-PK row upserts like any other key (presence ≠ key nullness)") {
    // the null-safe join matches NULL = NULL, so an unchanged NULL-key row
    // must keep BOTH audit columns — misreading `o.pk IS NULL` as "absent"
    // would reset loaded_at and bump last_upd_at on every run
    val t1 = lit("2024-01-01 00:00:00").cast("timestamp")
    val t2 = lit("2024-02-01 00:00:00").cast("timestamp")
    val old = Seq((Option.empty[Long], "a"), (Some(1L), "b")).toDF("pk", "attr")
      .select(col("pk"), col("attr"), t1.as("loaded_at"), t1.as("last_upd_at"))
    val incoming = Seq((Option.empty[Long], "a"), (Some(1L), "B")).toDF("pk", "attr")
      .select(col("pk"), col("attr"), t1.as("loaded_at"), t1.as("last_upd_at"))
    val out = MergeOps.conditionalUpsert(old, incoming, Seq("pk"), Seq("attr"), t2)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        (r.getString(1), r.getTimestamp(2), r.getTimestamp(3))).toMap
    val (ts1, ts2) = (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(out(-1L) == (("a", ts1, ts1)), "unchanged NULL-key row must be untouched")
    assert(out(1L) == (("B", ts1, ts2)), "changed row keeps loaded_at, bumps last_upd")
  }

  test("pruned upsert evolves the feed schema: new tracked column lands for touched keys, carried buckets read null") {
    val table = java.nio.file.Files.createTempDirectory("upsert_evolve").resolve("t")
    val t1 = lit("2024-01-01 00:00:00").cast("timestamp")
    def withAudit(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    // generation 1: (user_id, attr) only
    MergeOps.prunedConditionalUpsert(table,
      withAudit((1L to 64L).map(i => (i, s"a$i")).toDF("user_id", "attr")),
      pk = Seq("user_id"), tracked = Seq("attr"), runTs = t1,
      nParts = 8, keepVersions = 4)
    // generation 2 ADDS `score`, touching two keys: one with a changed
    // attr, one whose attr is identical (only the new column makes it a
    // change — stored null vs incoming value)
    MergeOps.prunedConditionalUpsert(table,
      withAudit(Seq((7L, "CHANGED", 0.7), (3L, "a3", 0.3))
        .toDF("user_id", "attr", "score")),
      pk = Seq("user_id"), tracked = Seq("attr", "score"), runTs = t1,
      nParts = 8, keepVersions = 4)
    val st = Storage.readPartitionedVersion(spark, table)
      .select("user_id", "attr", "score").collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(st(7L)._1 == "CHANGED" && st(7L)._2 == 0.7, st(7L).toString)
    assert(st(3L)._1 == "a3" && st(3L)._2 == 0.3,
      "identical attr + new column value must still count as a change")
    // untouched keys carry by reference and read null for the new column
    assert(st(5L)._1 == "a5" && st(5L)._2.isNaN, st(5L).toString)
    assert(st.size == 64)
    // the declared schema evolved: carried buckets' physical files still
    // lack the column (they were never rewritten)
    val manifest = Storage.readPartsManifest(
      table.resolve(s"v${Storage.currentVersion(table).get}"))
    assert(manifest.values.toSet.contains(0L),
      "some buckets must still be owned by the pre-evolution version")
    // idempotent redelivery of the evolving load rewrites ZERO buckets
    val vBefore = Storage.currentVersion(table).get
    MergeOps.prunedConditionalUpsert(table,
      withAudit(Seq((7L, "CHANGED", 0.7), (3L, "a3", 0.3))
        .toDF("user_id", "attr", "score")),
      pk = Seq("user_id"), tracked = Seq("attr", "score"), runTs = t1,
      nParts = 8, keepVersions = 4)
    val manifestAfter = Storage.readPartsManifest(
      table.resolve(s"v${Storage.currentVersion(table).get}"))
    assert(manifestAfter == manifest,
      "redelivering the evolved load must carry every bucket unchanged")
    assert(Storage.currentVersion(table).get == vBefore + 1)
  }
}

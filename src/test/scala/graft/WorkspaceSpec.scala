package graft

import java.nio.file.Files

import graft.ops.{MergeOps, Storage, Workspace}
import org.apache.spark.sql.functions._

/** Workspace-level multi-table snapshot transactions: the manifest create
  * is the commit point — readers see old-all or new-all, never a mix. */
class WorkspaceSpec extends SparkTestBase {

  private def kv(pairs: (Long, String)*) = {
    import spark.implicits._
    pairs.toSeq.toDF("k", "v")
  }

  test("commitAll publishes atomically; manifest history is workspace time travel") {
    val ws = Files.createTempDirectory("ws_atomic")
    val m1 = Workspace.commitAll(ws, Map(
      "a" -> kv(1L -> "a1"), "b" -> kv(1L -> "b1")))
    val m2 = Workspace.commitAll(ws, Map(
      "a" -> kv(1L -> "a2"), "b" -> kv(1L -> "b2")))
    assert(m2 == m1 + 1)

    // current view: new-all
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == "a2")
    assert(Workspace.readSnapshot(spark, ws, "b")
      .select("v").head.getString(0) == "b2")
    // a reader pinned at m1 sees old-all — consistent cross-table history
    val pins1 = Workspace.snapshotAt(ws, m1)
    assert(Workspace.readPinned(spark, ws, "a", pins1("a"))
      .select("v").head.getString(0) == "a1")
    assert(Workspace.readPinned(spark, ws, "b", pins1("b"))
      .select("v").head.getString(0) == "b1")
  }

  test("a transaction that dies before publishing leaves the old consistent view") {
    val ws = Files.createTempDirectory("ws_crash")
    val m1 = Workspace.commitAll(ws, Map(
      "a" -> kv(1L -> "a1"), "b" -> kv(1L -> "b1")), keepVersions = 4)
    // simulate a transaction that committed table 'a' and crashed before
    // the manifest create: the table-level version exists...
    Storage.commitVersion(kv(1L -> "aX"), ws.resolve("a"), keepVersions = 4)
    assert(Storage.readVersion(spark, ws.resolve("a"))
      .select("v").head.getString(0) == "aX", "table-level read is uncommitted-latest")
    // ...but the workspace view still serves the LAST PUBLISHED pair
    assert(Workspace.snapshot(ws)._1 == m1)
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == "a1")
    assert(Workspace.readSnapshot(spark, ws, "b")
      .select("v").head.getString(0) == "b1")
    // the next successful transaction publishes PAST the orphan version
    Workspace.commitAll(ws, Map("a" -> kv(1L -> "a2")), keepVersions = 4)
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == "a2")
  }

  test("concurrent disjoint transactions both land through the manifest CAS") {
    val ws = Files.createTempDirectory("ws_disjoint")
    Workspace.commitAll(ws, Map("a" -> kv(1L -> "a1")))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("c", "d", "e").map { name =>
      new Thread(() => {
        try Workspace.commitAll(ws, Map(name -> kv(1L -> s"$name-v")))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"disjoint transactions must all land: ${errs.peek()}")
    val (_, pins) = Workspace.snapshot(ws)
    assert(pins.keySet == Set("a", "c", "d", "e"), pins.toString)
    Seq("c", "d", "e").foreach { name =>
      assert(Workspace.readSnapshot(spark, ws, name)
        .select("v").head.getString(0) == s"$name-v")
    }
  }

  test("a publish that would regress another transaction's pin aborts loudly") {
    val ws = Files.createTempDirectory("ws_overlap")
    Workspace.commitAll(ws, Map("a" -> kv(1L -> "a1")))
    // a faster transaction already published table 'a' at a version AHEAD
    // of anything this transaction will commit (manifest handcrafted the
    // way a racing commitAll would have written it)
    val (m, pins) = Workspace.snapshot(ws)
    val future = pins("a") + 5
    val dir = ws.resolve("_WLOG")
    java.nio.file.Files.write(dir.resolve(f"w${m + 1}%010d.json"),
      s"""{"tables":{"a":$future}}""".getBytes("UTF-8"))
    val e = intercept[java.util.ConcurrentModificationException] {
      Workspace.commitAll(ws, Map("a" -> kv(1L -> "a2")))
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    // the winner's pin is intact
    assert(Workspace.snapshot(ws)._2("a") == future)
  }

  test("read-modify-write loser aborts after the winner publishes first (lost-update race)") {
    val ws = Files.createTempDirectory("ws_rmw")
    Workspace.commitAll(ws, Map("a" -> kv(1L -> "base")), keepVersions = 8)
    // both transactions derive their content from the SAME pre-race read
    val stale = Workspace.snapshot(ws)._2
    // T1 completes its whole cycle: table commit + publish
    Workspace.commitAll(ws, Map("a" -> kv(1L -> "t1")),
      keepVersions = 8, basedOn = Some(stale))
    // T2's content was computed from the pre-T1 pins; its table-level
    // commit would land at a HIGHER version than T1's, so the old
    // prev(t) >= committed(t) check let it publish and silently bury
    // T1's update — the base-pin check must abort it instead
    val e = intercept[java.util.ConcurrentModificationException] {
      Workspace.commitAll(ws, Map("a" -> kv(1L -> "t2-lost-update")),
        keepVersions = 8, basedOn = Some(stale))
    }
    assert(e.getMessage.contains("base"), e.getMessage)
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == "t1", "the first committer's update must survive")
  }

  test("concurrent overlapping read-modify-write: exactly one transaction wins") {
    val ws = Files.createTempDirectory("ws_race")
    Workspace.commitAll(ws, Map("a" -> kv(1L -> "base")), keepVersions = 8)
    val stale = Workspace.snapshot(ws)._2
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[Throwable])]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = Seq("t1", "t2").map { name =>
      new Thread(() => {
        gate.await()
        try {
          Workspace.commitAll(ws, Map("a" -> kv(1L -> name)),
            keepVersions = 8, basedOn = Some(stale))
          outcomes.add(name -> None)
        } catch { case t: Throwable => outcomes.add(name -> Some(t)) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val (winners, losers) = outcomes.asScala.toSeq.partition(_._2.isEmpty)
    assert(winners.size == 1 && losers.size == 1,
      s"exactly one transaction must land: ${outcomes.asScala.toSeq}")
    assert(losers.head._2.get.isInstanceOf[java.util.ConcurrentModificationException],
      losers.head._2.get.toString)
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == winners.head._1)
  }

  test("concurrent same-token commits publish exactly one manifest (idempotency race)") {
    val ws = Files.createTempDirectory("ws_tokrace")
    Workspace.commitAll(ws, Map("a" -> kv(1L -> "base")), keepVersions = 8)
    // two redeliveries of the SAME logical batch race: both miss the
    // pre-scan (neither has published), both commit table versions —
    // the in-loop token re-scan must collapse them onto ONE manifest
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        gate.await()
        try results.add(Right(Workspace.commitAll(ws,
          Map("a" -> kv(1L -> "delta-applied")),
          keepVersions = 8, idempotencyToken = Some("batch-42"))))
        catch { case t: Throwable => results.add(Left(t)) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(120000))
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    // a twin may lose the TABLE-level rename CAS and surface CME — the
    // redelivery contract is retry-until-success; what must NEVER happen
    // is two published manifests for one token (the double-applied delta)
    assert(rs.exists(_.isRight), s"at least one submission must land: $rs")
    assert(rs.collect { case Right(m) => m }.distinct.size == 1,
      s"all successful submissions must resolve to the SAME manifest: $rs")
    rs.collect { case Left(t) => t }.foreach(t =>
      assert(t.isInstanceOf[java.util.ConcurrentModificationException], t.toString))
    // a retry of the failed twin is the no-op the token exists for
    val retried = Workspace.commitAll(ws, Map("a" -> kv(1L -> "WOULD-DOUBLE")),
      keepVersions = 8, idempotencyToken = Some("batch-42"))
    assert(retried == rs.collect { case Right(m) => m }.head)
    // exactly one manifest carries the token — the delta applied once
    val (cur, _) = Workspace.snapshot(ws)
    val tokenManifests = (0L to cur).filter(m =>
      Workspace.txnTokenAt(ws, m).contains("batch-42"))
    assert(tokenManifests.size == 1, s"token must appear on exactly one manifest: $tokenManifests")
  }

  test("restoreTo republishes an old manifest: every table rolls back atomically, history intact") {
    val ws = Files.createTempDirectory("ws_restore")
    val m1 = Workspace.commitAll(ws, Map(
      "a" -> kv(1L -> "a1"), "b" -> kv(1L -> "b1")), keepVersions = 8)
    val m2 = Workspace.commitAll(ws, Map(
      "a" -> kv(1L -> "a2"), "b" -> kv(1L -> "b2")), keepVersions = 8)
    val m3 = Workspace.restoreTo(ws, m1)
    assert(m3 == m2 + 1, "restore must be a NEW manifest")
    // both tables serve the m1-era pair again
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == "a1")
    assert(Workspace.readSnapshot(spark, ws, "b")
      .select("v").head.getString(0) == "b1")
    // the rolled-back m2 view is still coherently readable
    val pins2 = Workspace.snapshotAt(ws, m2)
    assert(Workspace.readPinned(spark, ws, "a", pins2("a"))
      .select("v").head.getString(0) == "a2")
    // restoring to the current manifest no-ops
    assert(Workspace.restoreTo(ws, m3) == m3)
    // and the next forward transaction builds on the restored state
    val m4 = Workspace.commitAll(ws, Map("a" -> kv(1L -> "a3")), keepVersions = 8)
    assert(Workspace.snapshot(ws)._2("b") == pins2("b") - 1 ||
      Workspace.readSnapshot(spark, ws, "b").select("v").head.getString(0) == "b1")
    assert(m4 == m3 + 1)
  }

  test("idempotency token: a redelivered transaction no-ops instead of double-applying") {
    val ws = Files.createTempDirectory("ws_idem")
    val m1 = Workspace.commitAll(ws, Map("a" -> kv(1L -> "a1")),
      idempotencyToken = Some("batch-0"))
    // the redelivery (same token, possibly different recomputed content)
    // returns the ALREADY-PUBLISHED manifest — no new tables, no new
    // manifest, no double-applied delta
    val m1b = Workspace.commitAll(ws, Map("a" -> kv(1L -> "WOULD-DOUBLE")),
      idempotencyToken = Some("batch-0"))
    assert(m1b == m1, s"redelivery must return the original manifest, got w$m1b")
    assert(Workspace.snapshot(ws)._1 == m1)
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == "a1", "redelivery must not re-commit")
    // a LATER batch with its own token still lands, and the earlier token
    // stays recognized within the manifest window
    val m2 = Workspace.commitAll(ws, Map("a" -> kv(1L -> "a2")),
      idempotencyToken = Some("batch-1"))
    assert(m2 == m1 + 1)
    assert(Workspace.commitAll(ws, Map("a" -> kv(1L -> "X")),
      idempotencyToken = Some("batch-0")) == m1)
    assert(Workspace.readSnapshot(spark, ws, "a")
      .select("v").head.getString(0) == "a2")
  }

  test("alsoPin captures an externally-maintained table into the consistent view") {
    import spark.implicits._
    val ws = Files.createTempDirectory("ws_pin")
    // a pruned-upsert feed maintained OUTSIDE workspace transactions
    val feed = ws.resolve("feed")
    def load(rows: Seq[(Long, String)]): Unit =
      MergeOps.prunedConditionalUpsert(feed,
        rows.toDF("user_id", "attr")
          .withColumn("loaded_at", lit(null).cast("timestamp"))
          .withColumn("last_upd_at", lit(null).cast("timestamp")),
        pk = Seq("user_id"), tracked = Seq("attr"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
        nParts = 4, keepVersions = 8)
    load(Seq(1L -> "x"))
    val m1 = Workspace.commitAll(ws, Map("mart" -> kv(1L -> "m1")),
      alsoPin = Set("feed"), keepVersions = 8)
    // the feed advances outside any transaction...
    load(Seq(1L -> "y"))
    // ...current snapshot still serves the PINNED feed state with mart m1
    assert(Workspace.readSnapshot(spark, ws, "feed")
      .select("attr").head.getString(0) == "x")
    // a new transaction re-pins: now the view advances together
    Workspace.commitAll(ws, Map("mart" -> kv(1L -> "m2")),
      alsoPin = Set("feed"), keepVersions = 8)
    assert(Workspace.readSnapshot(spark, ws, "feed")
      .select("attr").head.getString(0) == "y")
    assert(Workspace.readSnapshot(spark, ws, "mart")
      .select("v").head.getString(0) == "m2")
    // and the m1-era pair is still coherently readable
    val pinsOld = Workspace.snapshotAt(ws, m1)
    assert(Workspace.readPinned(spark, ws, "feed", pinsOld("feed"))
      .select("attr").head.getString(0) == "x")
    assert(Workspace.readPinned(spark, ws, "mart", pinsOld("mart"))
      .select("v").head.getString(0) == "m1")
  }
}

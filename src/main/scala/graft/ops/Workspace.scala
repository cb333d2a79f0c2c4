package graft.ops

import java.nio.file.{Files, Path, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table snapshot transactions over a WORKSPACE of versioned tables —
  * the warehouse-level BEGIN/COMMIT the single-table commit log cannot
  * express: a load that refreshes several marts must expose either the old
  * set or the new set to a cross-table join, never a mix.
  *
  * Mechanism: each member table keeps its own [[Storage]] commit log
  * (unchanged); the workspace adds `_WLOG/w<M>.json` manifests pinning
  * {table → version}. A transaction commits its tables' versions FIRST
  * (each through the table-level CAS), then publishes them in ONE atomic
  * manifest create (CREATE_NEW — the filesystem's compare-and-swap; on an
  * object store, a conditional PUT). The manifest write IS the commit
  * point:
  *  - a crash before it leaves every reader on the previous manifest — the
  *    new table versions exist but are unreferenced (benign, vacuumed by
  *    their tables' own keep-windows);
  *  - a reader resolves ONE manifest and reads every table AS OF it —
  *    cross-table consistency for the duration of the job, exactly like
  *    the single-table snapshot-isolation story;
  *  - historical manifests are retained (bounded window), so
  *    "the whole warehouse as of transaction M" is a metadata lookup.
  *
  * Concurrent transactions serialize on the manifest CAS: a loser reloads
  * the winner's manifest, and if the table sets are DISJOINT rebases its
  * entries onto it and retries — both transactions land, like the
  * table-level disjoint-writer story. Overlapping table sets abort loudly,
  * and the conflict test is AGAINST THE TRANSACTION'S OWN BASE, not
  * against commit order: [[commitAll]] pins the workspace snapshot it
  * derives from (explicitly via `basedOn` for read-modify-write callers,
  * or implicitly at entry) and publishes only if every written table's
  * published pin is STILL that base — so a winner that committed AND
  * published first forces the slower overlapping transaction to abort
  * instead of silently burying the winner's update under a higher table
  * version (first-committer-wins, the snapshot-isolation write rule).
  * Unpublished orphan table versions (a crashed transaction's leftovers)
  * don't move the published pin and are legitimately committed past.
  *
  * Scale shape: commit cost is O(tables touched) metadata writes +
  * whatever the table writes themselves cost; the manifest is O(tables)
  * bytes; reads add ONE small-file resolve over the single-table path.
  */
object Workspace {

  private val WlogDir = "_WLOG"
  /** How many historical manifests survive [[vacuumWlog]] (and implicit
    * vacuum on commit) — the workspace's time-travel window. */
  private val KeepManifests = 32

  private def wlogDir(ws: Path): Path = ws.resolve(WlogDir)
  private def manifestFile(ws: Path, m: Long): Path =
    wlogDir(ws).resolve(f"w$m%010d.json")

  /** The newest manifest id, or None for a fresh workspace. */
  def currentTxn(ws: Path): Option[Long] = {
    val dir = wlogDir(ws)
    if (!Files.isDirectory(dir)) return None
    val s = Files.list(dir)
    val ids =
      try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .filter(n => n.startsWith("w") && n.endsWith(".json"))
        .flatMap(n => scala.util.Try(n.stripPrefix("w").stripSuffix(".json").toLong).toOption)
      finally s.close()
    ids.maxOption
  }

  /** The {table → version} pins of manifest `m`. */
  def snapshotAt(ws: Path, m: Long): Map[String, Long] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val f = manifestFile(ws, m)
    require(Files.exists(f), s"workspace manifest w$m not retained at $ws")
    JsonMethods.parse(new String(Files.readAllBytes(f), "UTF-8")) \ "tables" match {
      case JObject(fields) => fields.map {
        case (k, JLong(v)) => k -> v
        case (k, JInt(v)) => k -> v.toLong
        case (k, other) => throw new IllegalStateException(s"bad pin $k -> $other")
      }.toMap
      case _ => throw new IllegalStateException(s"malformed workspace manifest $f")
    }
  }

  /** The idempotency token manifest `m` was committed under (None when the
    * transaction declared none). */
  def txnTokenAt(ws: Path, m: Long): Option[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val f = manifestFile(ws, m)
    if (!Files.exists(f)) return None
    JsonMethods.parse(new String(Files.readAllBytes(f), "UTF-8")) \ "txn" match {
      case JString(s) => Some(s)
      case _ => None
    }
  }

  /** The current transactional view: (manifest id, {table → version}).
    * Empty for a fresh workspace. */
  def snapshot(ws: Path): (Long, Map[String, Long]) =
    currentTxn(ws) match {
      case None => (-1L, Map.empty)
      case Some(m) => (m, snapshotAt(ws, m))
    }

  /** Read `table` AS OF the workspace's current manifest (or an explicit
    * one via [[snapshotAt]] + [[readPinned]]). Tables of either flavor —
    * flat [[Storage.commitVersion]] or partition-manifested
    * [[Storage.commitPartitions]] — resolve transparently. */
  def readSnapshot(spark: SparkSession, ws: Path, table: String): DataFrame = {
    val (_, pins) = snapshot(ws)
    val v = pins.getOrElse(table, throw new IllegalArgumentException(
      s"table '$table' is not pinned by the current workspace manifest " +
        s"(${pins.keys.toSeq.sorted.mkString(", ")})"))
    readPinned(spark, ws, table, v)
  }

  /** Read one table at an explicit pinned version. */
  def readPinned(spark: SparkSession, ws: Path, table: String, v: Long): DataFrame = {
    val dir = ws.resolve(table)
    if (Files.exists(dir.resolve(s"v$v").resolve("_PARTS.json")))
      Storage.readPartitionedVersionAt(spark, dir, v)
    else Storage.readVersionAt(spark, dir, v)
  }

  /** The newest retained manifest committed under idempotency token `tok`,
    * scanning newest→oldest within the keep window. */
  private def findToken(ws: Path, tok: String): Option[Long] = {
    var m = currentTxn(ws).getOrElse(return None)
    while (m >= 0 && Files.exists(manifestFile(ws, m))) {
      if (txnTokenAt(ws, m).contains(tok)) return Some(m)
      m -= 1
    }
    None
  }

  /** Commit `writes` (table name → full next content, commitVersion
    * semantics) as ONE transaction: all tables' new versions become
    * visible to snapshot readers atomically. `alsoPin` names member tables
    * maintained OUTSIDE this transaction (e.g. a pruned-upsert feed) whose
    * CURRENT version should be captured into the same consistent view.
    *
    * `basedOn` declares the workspace pins this transaction's content was
    * DERIVED from (what [[snapshot]] returned when the caller read its
    * inputs): publish aborts with `ConcurrentModificationException` unless
    * every written table's published pin still equals its `basedOn` entry
    * (absent entry = "derived from the table not yet being published") —
    * first-committer-wins for overlapping read-modify-write transactions.
    * When omitted, the base is pinned at THIS CALL's entry, which closes
    * the commit-side race (a concurrent transaction that publishes between
    * our entry and our publish forces an abort) but cannot see reads the
    * caller performed before calling; pass `basedOn` for full
    * read-snapshot serialization.
    *
    * `keepVersions` applies to each member table's own log and must cover
    * the workspace's manifest window for time travel across manifests
    * (a pinned version only stays readable while its table retains it).
    *
    * `afterCommit` runs ONCE after the table versions land (durable,
    * unpublished at the WORKSPACE level) and before the publish loop; it
    * receives the committed {table → version} map and returns EXTRA
    * member pins to ride the same manifest — the hook
    * [[MatViews.workspaceCommitWithViews]] uses to roll materialized
    * views of the written tables and publish base + view pins in one
    * atomic manifest (a snapshot reader can then never observe a base
    * ahead of its views). A redelivered same-token transaction returns
    * its twin's manifest BEFORE the hook runs (nothing to re-apply).
    *
    * Returns the new manifest id. */
  def commitAll(ws: Path, writes: Map[String, DataFrame],
      alsoPin: Set[String] = Set.empty,
      keepVersions: Int = 4,
      idempotencyToken: Option[String] = None,
      basedOn: Option[Map[String, Long]] = None,
      afterCommit: Map[String, Long] => Map[String, Long] = _ => Map.empty): Long = {
    require(writes.nonEmpty, "empty transaction")
    writes.keys.foreach(validName)
    alsoPin.foreach(validName)
    Files.createDirectories(wlogDir(ws))
    // 0. exactly-once: a redelivered transaction (a foreachBatch retry, a
    //    restarted driver replaying its last batch) with the same token
    //    finds its already-published manifest and returns it — no table
    //    commits, no new manifest, no double-applied delta. The scan is
    //    bounded by the manifest keep window, which must therefore cover
    //    the redelivery horizon (for streaming: trivially, the LAST batch).
    //    This pre-scan only SAVES the wasted table commits; the
    //    authoritative check re-runs inside the publish loop below, where
    //    the manifest CAS serializes concurrent same-token twins.
    idempotencyToken.flatMap(findToken(ws, _)).foreach(m => return m)
    // the transaction's base: the pins its content derives from. Only the
    // WRITTEN tables' entries matter — per table either Some(version read)
    // or None (derived from the table not being published yet).
    val base: Map[String, Option[Long]] = {
      val pins = basedOn.getOrElse(snapshot(ws)._2)
      writes.keys.map(t => t -> pins.get(t)).toMap
    }
    // 1. land every table's version through its own CAS log — durable but
    //    UNPUBLISHED: no snapshot reader can see them yet
    val committed = writes.toSeq.sortBy(_._1).map { case (name, df) =>
      name -> Storage.commitVersion(df, ws.resolve(name), keepVersions = keepVersions)
    }.toMap
    val pinned = alsoPin.map { name =>
      name -> Storage.currentVersion(ws.resolve(name)).getOrElse(
        throw new IllegalArgumentException(
          s"alsoPin table '$name' has no committed version at $ws"))
    }.toMap
    // derived pins (maintained views of the just-committed tables): the
    // hook's table commits are durable like step 1's — a conflict abort
    // below leaves them unpublished at the workspace level but consistent
    // with the (table-published) base versions, so a retry re-derives
    val derived = afterCommit(committed)
    derived.keys.foreach(validName)
    // 2. publish: ONE manifest create is the atomic commit point; losers
    //    rebase onto the winner when disjoint, abort loudly on overlap
    var attempts = 0
    while (true) {
      val (m, prev) = snapshot(ws)
      // exactly-once, authoritative: a same-token twin may have published
      // while we were committing tables or between CAS rounds. Scanned
      // AFTER the snapshot read so any manifest `prev` reflects has
      // already been token-checked — the conflict test below can then
      // never misfire on our own twin (our orphaned table versions are
      // benign, vacuumed by the tables' keep windows).
      idempotencyToken.flatMap(findToken(ws, _)).foreach(twin => return twin)
      val conflict = committed.keys.filter { t =>
        // the published pin moved off our base → a concurrent overlapping
        // transaction landed since we read; publishing would bury it
        prev.get(t) != base(t) ||
          // and never regress a published pin, whatever the base claims
          prev.get(t).exists(_ >= committed(t))
      }
      if (conflict.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"workspace transaction conflict at $ws: table(s) " +
            s"${conflict.toSeq.sorted.mkString(", ")} were published past this " +
            s"transaction's base pins by a concurrent commit (base " +
            s"${conflict.toSeq.sorted.map(t => s"$t=${base(t).fold("∅")(_.toString)}").mkString(", ")}, " +
            s"published ${conflict.toSeq.sorted.map(t => s"$t=${prev.get(t).fold("∅")(_.toString)}").mkString(", ")})" +
            " — re-read and rerun")
      val next = prev ++ committed ++ pinned ++ derived
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val body = JsonMethods.compact(JsonMethods.render(JObject(
        "tables" -> JObject(next.toSeq.sortBy(_._1)
          .map { case (k, v) => k -> (JLong(v): JValue) }.toList) ::
        idempotencyToken.map(t => "txn" -> (JString(t): JValue)).toList)))
      try {
        Files.write(manifestFile(ws, m + 1), body.getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW)
        vacuumWlog(ws, m + 1)
        return m + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          if (attempts >= 16)
            throw new java.util.ConcurrentModificationException(
              s"gave up after $attempts manifest CAS rounds at $ws (writer storm)")
        // loop: reload the winner's manifest and re-check
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Whole-warehouse RESTORE: republish manifest `m`'s pins as a NEW
    * manifest — every table rolls back to its `m`-era version in ONE
    * atomic publish, the workspace twin of [[Storage.restore]] and pure
    * metadata (table logs untouched; the pinned versions must still be
    * retained, which is what `keepVersions` on the member commits buys).
    * History is preserved: the rolled-back manifests remain readable.
    * Returns the new manifest id; restoring to the current one no-ops. */
  def restoreTo(ws: Path, m: Long): Long = {
    val (cur, _) = snapshot(ws)
    require(cur >= 0, s"empty workspace at $ws")
    if (m == cur) return cur
    val pins = snapshotAt(ws, m) // throws if the manifest aged out
    pins.foreach { case (t, v) =>
      require(Files.exists(ws.resolve(t).resolve(s"v$v")),
        s"cannot restore to w$m: table '$t' no longer retains v$v " +
          "(raise keepVersions on its commits to widen the rollback horizon)")
    }
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    var attempts = 0
    while (true) {
      val (cur2, _) = snapshot(ws)
      val body = JsonMethods.compact(JsonMethods.render(JObject(
        "tables" -> JObject(pins.toSeq.sortBy(_._1)
          .map { case (k, v) => k -> (JLong(v): JValue) }.toList))))
      try {
        Files.write(manifestFile(ws, cur2 + 1), body.getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW)
        vacuumWlog(ws, cur2 + 1)
        return cur2 + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          if (attempts >= 16)
            throw new java.util.ConcurrentModificationException(
              s"gave up restoring workspace $ws after $attempts CAS rounds")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Drop manifests older than the keep window — never the newest. */
  private def vacuumWlog(ws: Path, newest: Long): Unit =
    ((newest - 2L * KeepManifests) until (newest - KeepManifests))
      .filter(_ >= 0).foreach(m => Files.deleteIfExists(manifestFile(ws, m)))

  private def validName(name: String): Unit =
    require(name.nonEmpty && !name.startsWith("_") && !name.startsWith(".") &&
      !name.contains("/") && !name.contains(java.io.File.separator),
      s"invalid workspace table name '$name'")
}

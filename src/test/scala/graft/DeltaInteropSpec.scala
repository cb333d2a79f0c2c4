package graft

import java.nio.file.{Files, Path}

import graft.ops.{DeltaInterop, MergeOps, Storage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Every committed version directory must be a valid standalone Delta Lake
  * table per the published protocol (delta-io/delta PROTOCOL.md): these
  * tests parse the log the way an EXTERNAL engine would — raw JSON, no graft
  * read helpers — and assert protocol fields, file coverage, stats, and
  * snapshot equivalence for both commit shapes.
  */
class DeltaInteropSpec extends SparkTestBase {

  private def logLines(versionDir: Path): Seq[JValue] = {
    val log = DeltaInterop.logFile(versionDir)
    assert(Files.exists(log), s"missing Delta log at $log")
    new String(Files.readAllBytes(log), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq.map(JsonMethods.parse(_))
  }

  private def addActions(lines: Seq[JValue]): Seq[JValue] =
    lines.flatMap(l => (l \ "add") match { case JNothing => None; case a => Some(a) })

  test("commitVersion writes a protocol-compliant single-commit Delta log") {
    val table = Files.createTempDirectory("delta_plain").resolve("t")
    val nation = Tables.nation(spark, Sf001)
    Storage.commitVersion(nation, table)
    val vdir = table.resolve("v0")
    val lines = logLines(vdir)

    // exactly one protocol and one metaData action, protocol-minimum versions
    val protocols = lines.flatMap(l => (l \ "protocol") match {
      case JNothing => None; case p => Some(p) })
    assert(protocols.size == 1)
    assert((protocols.head \ "minReaderVersion") == JInt(1))
    assert((protocols.head \ "minWriterVersion") == JInt(2))

    val metas = lines.flatMap(l => (l \ "metaData") match {
      case JNothing => None; case m => Some(m) })
    assert(metas.size == 1)
    val meta = metas.head
    assert((meta \ "format" \ "provider") == JString("parquet"))
    assert((meta \ "partitionColumns") == JArray(Nil))
    // schemaString is Spark-schema JSON and round-trips to the frame's schema
    val schemaString = (meta \ "schemaString").asInstanceOf[JString].s
    assert(DataType.fromJson(schemaString).asInstanceOf[StructType] == nation.schema)

    // add actions cover EXACTLY the data files, with true sizes
    val adds = addActions(lines)
    val dataFiles = {
      val s = Files.list(vdir)
      try s.toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      finally s.close()
    }
    val addPaths = adds.map(a => (a \ "path").asInstanceOf[JString].s)
    assert(addPaths.toSet == dataFiles.map(_.getFileName.toString).toSet)
    def asLong(v: JValue): Long = v match {
      case JLong(n) => n; case JInt(n) => n.toLong; case other => fail(s"not a number: $other")
    }
    adds.foreach { a =>
      val p = vdir.resolve((a \ "path").asInstanceOf[JString].s)
      assert(asLong(a \ "size") == Files.size(p), s"size mismatch for $p")
      assert((a \ "dataChange") == JBool(true))
    }

    // per-file stats: numRecords sums to the row count; min/max usable
    val statsJ = adds.map(a => JsonMethods.parse((a \ "stats").asInstanceOf[JString].s))
    val numRecords = statsJ.map(s => (s \ "numRecords") match {
      case JLong(n) => n; case JInt(n) => n.toLong; case other => fail(s"bad numRecords $other") })
    assert(numRecords.sum == nation.count())
    val mins = statsJ.map(s => (s \ "minValues" \ "n_nationkey"))
    assert(mins.forall(_.isInstanceOf[JInt]), s"expected integer minValues, got $mins")
  }

  test("external-engine read (log-driven, schema-typed) equals readVersion") {
    val table = Files.createTempDirectory("delta_read").resolve("t")
    val orders = Tables.orders(spark, Sf001)
    val v = Storage.commitVersion(orders.repartition(4), table)
    val ext = DeltaInterop.readSnapshot(spark, table.resolve(s"v$v"))
    val own = Storage.readVersion(spark, table)
    assert(ext.schema == own.schema)
    assert(ext.exceptAll(own).isEmpty && own.exceptAll(ext).isEmpty)
  }

  test("commitPartitions carries untouched partitions as absolute-URI adds (shallow clone)") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_parts").resolve("t")

    def withAudit(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    val t0 = lit("2024-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2024-02-01 00:00:00").cast("timestamp")
    val base = withAudit(spark.range(200).select($"id".as("k"),
      ($"id" % 7).cast("string").as("attr")))
    MergeOps.prunedConditionalUpsert(table, base,
      pk = Seq("k"), tracked = Seq("attr"), runTs = t0, nParts = 8)
    val inc = withAudit(Seq(0L -> "X", 999L -> "NEW").toDF("k", "attr"))
    MergeOps.prunedConditionalUpsert(table, inc,
      pk = Seq("k"), tracked = Seq("attr"), runTs = t1, nParts = 8)

    val v1 = table.resolve("v1")
    val lines = logLines(v1)
    val metas = lines.flatMap(l => (l \ "metaData") match {
      case JNothing => None; case m => Some(m) })
    assert((metas.head \ "partitionColumns") == JArray(List(JString("pbucket"))))

    val adds = addActions(lines)
    val (abs, rel) = adds.partition(a =>
      (a \ "path").asInstanceOf[JString].s.startsWith("file:"))
    assert(rel.nonEmpty, "rewritten buckets must be relative adds")
    assert(abs.nonEmpty, "carried buckets must be absolute-URI adds")
    // carried adds point into v0, never into v1
    abs.foreach { a =>
      val p = (a \ "path").asInstanceOf[JString].s
      assert(p.contains("/v0/"), s"carried add should reference v0: $p")
      assert(Files.exists(java.nio.file.Paths.get(java.net.URI.create(p))), s"dangling carry: $p")
    }
    // every add names its bucket in partitionValues (values are NOT in data files)
    adds.foreach { a =>
      (a \ "partitionValues" \ "pbucket") match {
        case JString(_) => ()
        case other => fail(s"missing pbucket partition value: $other")
      }
    }

    // the log-driven external read reconstructs the partition column and
    // equals the engine's own manifest-driven read
    val ext = DeltaInterop.readSnapshot(spark, v1)
    val own = Storage.readPartitionedVersion(spark, table)
    assert(ext.columns.sorted.toSeq == own.columns.sorted.toSeq)
    val e = ext.select(own.columns.map(col).toIndexedSeq: _*)
    assert(e.exceptAll(own).isEmpty && own.exceptAll(e).isEmpty)
  }

  test("zero-add log (empty bootstrap commit) reads as an empty frame with the log's schema") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_empty").resolve("t")
    val empty = spark.range(0).select($"id".as("k"), lit(0).as("pbucket"))
    Storage.commitPartitions(empty, table, "pbucket")
    val ext = DeltaInterop.readSnapshot(spark, table.resolve("v0"))
    assert(ext.count() == 0)
    assert(ext.columns.toSeq == Seq("k", "pbucket"))
  }

  test("second incremental commit carries through a chain: absolute adds survive re-carry") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_chain").resolve("t")
    def withAudit(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    val ts = Seq("2024-01-01", "2024-02-01", "2024-03-01")
      .map(d => lit(s"$d 00:00:00").cast("timestamp"))
    val base = withAudit(spark.range(100).select($"id".as("k"), lit("a").as("attr")))
    MergeOps.prunedConditionalUpsert(table, base,
      pk = Seq("k"), tracked = Seq("attr"), runTs = ts(0), nParts = 8)
    MergeOps.prunedConditionalUpsert(table,
      withAudit(Seq(1L -> "b").toDF("k", "attr")),
      pk = Seq("k"), tracked = Seq("attr"), runTs = ts(1), nParts = 8)
    // vacuum keeps v0 alive because the live manifest still references it
    MergeOps.prunedConditionalUpsert(table,
      withAudit(Seq(2L -> "c").toDF("k", "attr")),
      pk = Seq("k"), tracked = Seq("attr"), runTs = ts(2), nParts = 8)

    // v2's log must still reference v0 (twice-carried) and v1 bytes
    val v2 = table.resolve("v2")
    val paths = addActions(logLines(v2)).map(a => (a \ "path").asInstanceOf[JString].s)
    assert(paths.exists(_.contains("/v0/")), s"v0 bytes must still be referenced: $paths")
    val ext = DeltaInterop.readSnapshot(spark, v2)
    val own = Storage.readPartitionedVersion(spark, table)
    val e = ext.select(own.columns.map(col).toIndexedSeq: _*)
    assert(e.exceptAll(own).isEmpty && own.exceptAll(e).isEmpty)
    assert(ext.count() == 100)
  }

  // ---- table-level continuous log + checkpoints ---------------------------

  test("table log: incremental entries — a full-replace commit removes every prior file") {
    import spark.implicits._
    val table = Files.createTempDirectory("tlog_incr").resolve("t")
    Storage.commitVersion(spark.range(10).select($"id".as("k")), table, keepVersions = 4)
    Storage.commitVersion(spark.range(20).select($"id".as("k")), table, keepVersions = 4)
    val logDir = DeltaInterop.tableLogDir(table)
    assert(Files.exists(logDir.resolve(f"${0L}%020d.json")))
    val c1 = new String(Files.readAllBytes(logDir.resolve(f"${1L}%020d.json")), "UTF-8")
      .split("\n").toSeq.map(JsonMethods.parse(_))
    val removes = c1.flatMap(l => (l \ "remove" \ "path") match {
      case JString(p) => Some(p); case _ => None })
    val adds = c1.flatMap(l => (l \ "add" \ "path") match {
      case JString(p) => Some(p); case _ => None })
    assert(removes.nonEmpty && removes.forall(_.startsWith("v0/")),
      s"commit 1 must remove v0's files: $removes")
    assert(adds.nonEmpty && adds.forall(_.startsWith("v1/")),
      s"commit 1 must add v1's files: $adds")
    // live-table read equals the engine's own read
    val ext = DeltaInterop.readTableSnapshot(spark, table)
    assert(ext.as[Long].collect().sorted.toSeq == (0L until 20L))
  }

  test("table log: checkpoint cut at interval; reader never opens pre-checkpoint JSONs") {
    import spark.implicits._
    val table = Files.createTempDirectory("tlog_ckpt").resolve("t")
    // 12 commits crosses CheckpointInterval (10); keepVersions=1 also
    // proves vacuumed version dirs never break the replay
    (0 until 12).foreach { k =>
      Storage.commitVersion(
        spark.range(k + 1).select($"id".as("k"), lit(k).as("commit_no")), table)
    }
    assert(DeltaInterop.lastCheckpointVersion(table).contains(10L))
    assert(Files.exists(DeltaInterop.checkpointFile(table, 10L)))
    val logDir = DeltaInterop.tableLogDir(table)
    // corrupt EVERY pre-checkpoint JSON — a reader that touches any of
    // them dies on parse, so surviving this proves O(trailing) replay
    (0L to 10L).foreach { v =>
      Files.write(logDir.resolve(f"$v%020d.json"), "NOT JSON".getBytes("UTF-8"))
    }
    val ext = DeltaInterop.readTableSnapshot(spark, table)
    val own = Storage.readVersion(spark, table)
    assert(ext.select("k", "commit_no").exceptAll(own.select("k", "commit_no")).isEmpty &&
      own.select("k", "commit_no").exceptAll(ext.select("k", "commit_no")).isEmpty)
    assert(ext.count() == 12 && ext.agg(max($"commit_no")).head.getInt(0) == 11)
    // external-engine fidelity: the driver-written checkpoint parquet is
    // readable by a STANDARD engine (Spark here) with the protocol's
    // struct shape — path under add, partitionValues as a map, the
    // metaData row carrying the declared schema
    val ckpt = spark.read.parquet(DeltaInterop.checkpointFile(table, 10L).toString)
    assert(ckpt.columns.toSet == Set("protocol", "metaData", "add", "remove"))
    val ckptAdds = ckpt.filter("add IS NOT NULL").select("add.path")
      .as[String].collect().toSeq
    assert(ckptAdds.nonEmpty && ckptAdds.forall(_.startsWith("v10/")),
      s"checkpoint at v10 (full-replace commits) must hold exactly v10's adds: $ckptAdds")
    // the checkpoint carries the trailing window's unexpired remove
    // tombstones (reference checkpoint format): the ten full-replace
    // commits each tombstoned the prior version's files, all within
    // retention, none live again
    val ckptRemoves = ckpt.filter("remove IS NOT NULL").select("remove.path")
      .as[String].collect().toSeq
    assert(ckptRemoves.nonEmpty, "checkpoint must carry unexpired remove tombstones")
    assert((0 until 10).forall(v => ckptRemoves.exists(_.startsWith(s"v$v/"))),
      s"every replaced version's files must be tombstoned in the checkpoint: $ckptRemoves")
    assert(ckptRemoves.toSet.intersect(ckptAdds.toSet).isEmpty,
      "a live file must never appear as a checkpoint tombstone")
    assert(ckpt.filter("remove IS NOT NULL")
      .select("remove.deletionTimestamp").as[Long].collect()
      .forall(ts => System.currentTimeMillis() - ts < DeltaInterop.RemoveRetentionMs))
    val mdSchema = ckpt.filter("metaData IS NOT NULL")
      .select("metaData.schemaString").as[String].head()
    assert(org.apache.spark.sql.types.DataType.fromJson(mdSchema)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
      Seq("k", "commit_no"))
    assert(ckpt.filter("protocol IS NOT NULL")
      .select("protocol.minReaderVersion").head.getInt(0) == 1)
  }

  test("table log: commitPartitions entries add only rewritten buckets; carried buckets stay silent") {
    import spark.implicits._
    val table = Files.createTempDirectory("tlog_parts").resolve("t")
    def withAudit(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    MergeOps.prunedConditionalUpsert(table,
      withAudit(spark.range(200).select($"id".as("k"), ($"id" % 7).cast("string").as("attr"))),
      pk = Seq("k"), tracked = Seq("attr"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 8)
    MergeOps.prunedConditionalUpsert(table,
      withAudit(Seq(0L -> "X").toDF("k", "attr")),
      pk = Seq("k"), tracked = Seq("attr"),
      runTs = lit("2024-02-01 00:00:00").cast("timestamp"), nParts = 8)
    val c1 = new String(Files.readAllBytes(
      DeltaInterop.tableLogDir(table).resolve(f"${1L}%020d.json")), "UTF-8")
      .split("\n").toSeq.map(JsonMethods.parse(_))
    val adds = c1.flatMap(l => (l \ "add" \ "path") match {
      case JString(p) => Some(p); case _ => None })
    val removes = c1.flatMap(l => (l \ "remove" \ "path") match {
      case JString(p) => Some(p); case _ => None })
    // one bucket rewritten: only its v1 files add, only its v0 files
    // remove — untouched buckets appear in NEITHER list (that's the
    // incremental shape; re-adding carries would make replay O(table))
    assert(adds.nonEmpty && adds.forall(_.startsWith("v1/")), adds.toString)
    assert(removes.nonEmpty && removes.forall(_.startsWith("v0/")), removes.toString)
    val buckets = (adds ++ removes).flatMap(_.split("/").find(_.startsWith("pbucket=")))
    assert(buckets.toSet.size == 1, s"exactly one bucket should churn: $buckets")

    val ext = DeltaInterop.readTableSnapshot(spark, table)
    val own = Storage.readPartitionedVersion(spark, table)
    val e = ext.select(own.columns.map(col).toIndexedSeq: _*)
    assert(e.exceptAll(own).isEmpty && own.exceptAll(e).isEmpty)
  }

  test("table log: a 25-commit history crosses TWO checkpoints; replay always starts at the newest") {
    import spark.implicits._
    val table = Files.createTempDirectory("tlog_two_ckpt").resolve("t")
    (0 until 25).foreach { k =>
      Storage.commitVersion(
        spark.range(k + 1).select($"id".as("k"), lit(k).as("commit_no")), table)
    }
    // checkpoints cut at 10 and 20; the pointer tracks the newest
    assert(Files.exists(DeltaInterop.checkpointFile(table, 10L)))
    assert(Files.exists(DeltaInterop.checkpointFile(table, 20L)))
    assert(DeltaInterop.lastCheckpointVersion(table).contains(20L))
    // log retention at the v20 cut: commit JSONs more than one interval
    // behind are cleaned (a reader at most one checkpoint behind never
    // touches them), the in-window ones survive — the log directory stays
    // O(interval), not O(lifetime)
    val logDir = DeltaInterop.tableLogDir(table)
    (0L until 10L).foreach { v =>
      assert(!Files.exists(logDir.resolve(f"$v%020d.json")),
        s"commit $v should be cleaned by the v20 checkpoint")
    }
    (10L to 24L).foreach { v =>
      assert(Files.exists(logDir.resolve(f"$v%020d.json")),
        s"in-window commit $v must survive retention")
    }
    // replay must ignore EVERYTHING at or below 20 — including the older
    // checkpoint and the JSONs between the two checkpoints
    (0L to 20L).foreach { v =>
      Files.write(logDir.resolve(f"$v%020d.json"), "NOT JSON".getBytes("UTF-8"))
    }
    Files.write(DeltaInterop.checkpointFile(table, 10L), "NOT PARQUET".getBytes("UTF-8"))
    val ext = DeltaInterop.readTableSnapshot(spark, table)
    assert(ext.count() == 25 && ext.agg(max($"commit_no")).head.getInt(0) == 24)
    val own = Storage.readVersion(spark, table)
    assert(ext.select("k", "commit_no").exceptAll(own.select("k", "commit_no")).isEmpty &&
      own.select("k", "commit_no").exceptAll(ext.select("k", "commit_no")).isEmpty)
  }

  test("table log: repairOrphans DEMOTES _last_checkpoint to the newest surviving checkpoint") {
    import spark.implicits._
    val table = Files.createTempDirectory("tlog_demote").resolve("t")
    (0 until 12).foreach { k =>
      Storage.commitVersion(spark.range(k + 1).select($"id".as("k")), table)
    }
    assert(DeltaInterop.lastCheckpointVersion(table).contains(10L))
    // crash simulation: v12 promoted, its log entry + checkpoint + pointer
    // update all written, _LATEST never swapped
    val logDir = DeltaInterop.tableLogDir(table)
    Files.copy(logDir.resolve(f"${11L}%020d.json"), logDir.resolve(f"${12L}%020d.json"))
    Files.copy(DeltaInterop.checkpointFile(table, 10L),
      DeltaInterop.checkpointFile(table, 12L))
    Files.write(DeltaInterop.lastCheckpointFile(table),
      """{"version":12,"size":3}""".getBytes("UTF-8"))
    Storage.repairOrphans(table)
    // the pointer must fall BACK to 10, not vanish: deleting it would
    // demote every read to O(history) JSON replay — prove it by corrupting
    // the pre-checkpoint JSONs and reading anyway
    assert(DeltaInterop.lastCheckpointVersion(table).contains(10L),
      "must demote to the surviving checkpoint, not delete the pointer")
    assert(!Files.exists(DeltaInterop.checkpointFile(table, 12L)))
    (0L to 10L).foreach { v =>
      Files.write(logDir.resolve(f"$v%020d.json"), "NOT JSON".getBytes("UTF-8"))
    }
    assert(DeltaInterop.readTableSnapshot(spark, table).count() == 12)
  }

  test("table log: repairOrphans truncates an above-pointer entry") {
    import spark.implicits._
    val table = Files.createTempDirectory("tlog_repair").resolve("t")
    Storage.commitVersion(spark.range(5).select($"id".as("k")), table)
    // simulate the crash window: v1 promoted + log appended, pointer not
    // yet swapped → on restart the pointer still says v0
    val logDir = DeltaInterop.tableLogDir(table)
    Files.copy(logDir.resolve(f"${0L}%020d.json"), logDir.resolve(f"${1L}%020d.json"))
    Storage.repairOrphans(table)
    assert(!Files.exists(logDir.resolve(f"${1L}%020d.json")),
      "orphan table-log entry must be truncated with its version dir")
    assert(DeltaInterop.latestTableCommit(table).contains(0L))
    assert(DeltaInterop.readTableSnapshot(spark, table).count() == 5)
  }

  test("deletion vectors ride both Delta logs: post-delete state from the log ALONE, zero rewrites") {
    import spark.implicits._
    val table = Files.createTempDirectory("delta_dv").resolve("t")
    def withAudit(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    val base = withAudit(spark.range(100).select($"id".as("k"),
      ($"id" % 7).cast("string").as("attr")))
    MergeOps.prunedConditionalUpsert(table, base, pk = Seq("k"),
      tracked = Seq("attr"), runTs = lit("2024-01-01 00:00:00").cast("timestamp"),
      nParts = 4, keepVersions = 8)
    def extKeys(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select($"k".cast("long")).as[Long].collect().toSet
    val all = (0L until 100L).toSet

    val vd = MergeOps.deleteWithVectors(table,
      spark.range(100).filter($"id" % 10 === 0).select($"id".as("k")),
      pk = Seq("k"), nParts = 4, keepVersions = 8)
    val gone1 = all.filter(_ % 10 == 0)
    // zero data rewrites: the DV version dir holds no partition dirs
    val s = Files.list(table.resolve(s"v$vd"))
    try assert(!s.toArray.exists(_.asInstanceOf[Path].getFileName.toString
      .startsWith("pbucket=")), "DV commit must rewrite no data")
    finally s.close()

    // per-version log alone sees post-delete rows
    assert(extKeys(DeltaInterop.readSnapshot(spark, table.resolve(s"v$vd")))
      == all -- gone1, "readSnapshot must subtract add.deletionVector rows")
    // table-level log alone (checkpoint/trailing replay) sees them too
    assert(extKeys(DeltaInterop.readTableSnapshot(spark, table)) == all -- gone1)

    // protocol + descriptor shape, parsed raw like an external engine
    val lines = logLines(table.resolve(s"v$vd"))
    val proto = lines.flatMap(l => (l \ "protocol") match {
      case JNothing => None; case p => Some(p) }).head
    assert((proto \ "minReaderVersion") == JInt(3) &&
      (proto \ "minWriterVersion") == JInt(7), "DV commit must bump the protocol")
    assert((proto \ "readerFeatures") == JArray(List(JString("deletionVectors"))))
    val dvAdds = addActions(lines).filter(a =>
      (a \ "deletionVector") != JNothing)
    assert(dvAdds.nonEmpty, "affected adds must carry the descriptor")
    dvAdds.foreach { a =>
      assert((a \ "deletionVector" \ "storageType") == JString("i"))
      (a \ "stats") match { // protocol: DV'd stats stop being tight
        case JString(st) => assert(st.contains("\"tightBounds\":false"),
          s"DV'd add must mark stats untight: $st")
        case _ => ()
      }
    }
    val card = dvAdds.map(a => (a \ "deletionVector" \ "cardinality") match {
      case JLong(n) => n; case JInt(n) => n.toLong; case _ => 0L }).sum
    assert(card == gone1.size.toLong, s"descriptor cardinalities must cover the takedown: $card")

    // a second DV delete merges: the table log swaps the incarnation
    // (remove with the OLD descriptor + re-add with the merged one) and
    // the log-alone read reflects both deletes
    val vd2 = MergeOps.deleteWithVectors(table,
      spark.range(100).filter($"id" % 7 === 1).select($"id".as("k")),
      pk = Seq("k"), nParts = 4, keepVersions = 8)
    val gone2 = gone1 ++ all.filter(_ % 7 == 1)
    assert(extKeys(DeltaInterop.readTableSnapshot(spark, table)) == all -- gone2)
    val c2 = new String(Files.readAllBytes(
      DeltaInterop.tableLogDir(table).resolve(f"$vd2%020d.json")), "UTF-8")
      .split("\n").toSeq.map(JsonMethods.parse(_))
    val rmWithDv = c2.filter(l => (l \ "remove") != JNothing &&
      (l \ "remove" \ "deletionVector") != JNothing)
    assert(rmWithDv.nonEmpty,
      "a DV incarnation swap must remove the old (path, DV) before re-adding")

    // an organic rewrite of one bucket sheds its descriptors but keeps
    // the others; compaction clears every descriptor — log-alone reads
    // stay state-identical throughout
    MergeOps.compactDeletionVectors(spark, table, keepVersions = 8)
    assert(extKeys(DeltaInterop.readTableSnapshot(spark, table)) == all -- gone2)
    val cur = Storage.currentVersion(table).get
    assert(extKeys(DeltaInterop.readSnapshot(spark, table.resolve(s"v$cur"))) == all -- gone2)
    val postLines = logLines(table.resolve(s"v$cur"))
    assert(addActions(postLines).forall(a => (a \ "deletionVector") == JNothing),
      "compaction must clear every descriptor from the log")
    // protocol stickiness: the TABLE log never silently downgrades — the
    // post-compaction commit is DV-free but keeps the declared feature
    // (dropping a feature is an explicit protocol action in the
    // reference, never an implicit side effect of compaction)
    val postCommit = new String(Files.readAllBytes(
      DeltaInterop.tableLogDir(table).resolve(f"$cur%020d.json")), "UTF-8")
      .split("\n").toSeq.map(JsonMethods.parse(_))
    val postProto = postCommit.flatMap(l => (l \ "protocol") match {
      case JNothing => None; case p => Some(p) }).head
    assert((postProto \ "minReaderVersion") == JInt(3),
      s"table protocol must stay sticky after compaction: $postProto")
  }
}

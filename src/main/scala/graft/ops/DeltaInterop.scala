package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta Lake transaction-log interop for the versioned commit log.
  *
  * [[Storage.commitVersion]]'s `_LATEST`/`v<N>` layout is correct but opaque
  * to every other engine — the gap a real deployment hits first. The Delta
  * Lake transaction-log format is a published open protocol
  * (github.com/delta-io/delta, PROTOCOL.md): a table is a directory whose
  * `_delta_log/<version>.json` files list newline-delimited JSON actions
  * (`protocol`, `metaData`, `add`, `remove`). This module writes that log at
  * commit time so EVERY committed version directory is simultaneously a
  * valid, standalone Delta table (version 0 = the snapshot): point Spark
  * with delta-spark, Trino, or DuckDB's delta extension at
  * `table/v<N>` and it reads the exact committed snapshot — zero data
  * copies, zero export jobs.
  *
  * Two shapes:
  *  - [[Storage.commitVersion]]: all add-paths are relative file names
  *    inside the version directory — the plain-table shape.
  *  - [[Storage.commitPartitions]]: partitions rewritten by this commit are
  *    relative `col=value/part-*.parquet` adds; untouched partitions carry
  *    forward as ABSOLUTE `file:` URI adds pointing into the owning older
  *    version directory — exactly Delta's shallow-clone shape, so the
  *    by-reference commit stays O(changed partitions) while still being a
  *    complete external-readable table. Carried adds are copied from the
  *    PREVIOUS version's log (metadata-only), so untouched partitions are
  *    still never listed.
  *
  * Each `add` carries the protocol's optional per-file `stats` JSON
  * (`numRecords` + `minValues`/`maxValues` for top-level numeric and string
  * columns), read from the freshly-written parquet footers — a Delta reader
  * gets file skipping on the same stats [[Storage.statsPrunedFiles]] uses.
  *
  * Scale note: the log is one small JSON file per commit, built from footer
  * metadata already in page cache from the write — commit cost stays
  * metadata-only, independent of table size.
  *
  * Besides the per-version logs, every commit also appends to a TABLE-LEVEL
  * continuous log (`table/_delta_log/<v>.json` with incremental add/remove
  * actions, protocol checkpoints every [[CheckpointInterval]] commits) — see
  * the table-level section below; [[readTableSnapshot]] is the live-table
  * reader that replays checkpoint + trailing commits only.
  *
  * Limitations (documented, not hidden): partition values are written raw
  * (the tables here use numeric bucket values — no special-character
  * escaping); the table-level log entry can trail the `_LATEST` pointer by
  * at most the one in-flight commit after a crash
  * ([[Storage.repairOrphans]] reconciles).
  */
object DeltaInterop {

  private val LogDirName = "_delta_log"
  private val Commit0 = "00000000000000000000.json"

  def logFile(versionDir: Path): Path = versionDir.resolve(LogDirName).resolve(Commit0)

  /** The commit's DECLARED schema (metaData.schemaString) without parsing
    * add actions — the cheap read for schema alignment on the composed-read
    * path (a large commit's log is mostly adds; alignment only needs the
    * one metaData line). None when the version carries no log. */
  def declaredSchema(versionDir: Path): Option[org.apache.spark.sql.types.StructType] = {
    val log = logFile(versionDir)
    if (!Files.exists(log)) None
    else {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      new String(Files.readAllBytes(log), "UTF-8").split("\n").iterator
        .filter(_.contains("\"metaData\""))
        .map(JsonMethods.parse(_))
        .collectFirst { case JObject(fields) if fields.exists(_._1 == "metaData") =>
          val md = fields.collectFirst { case ("metaData", m) => m }.get
          org.apache.spark.sql.types.DataType
            .fromJson((md \ "schemaString").asInstanceOf[JString].s)
            .asInstanceOf[org.apache.spark.sql.types.StructType]
        }
    }
  }

  /** One `add` action: `path` is a relative path inside the version dir or
    * an absolute `file:` URI (the shallow-clone carry). `stats` is the
    * protocol's JSON-as-string per-file stats payload. */
  final case class Add(
      path: String,
      partitionValues: Map[String, String],
      size: Long,
      modificationTime: Long,
      stats: Option[String])

  final case class Snapshot(schemaJson: String, partitionColumns: Seq[String], adds: Seq[Add])

  // ---- write side ---------------------------------------------------------

  /** Write `_delta_log/…0.json` into `versionDir` (normally the staging dir,
    * pre-promote): protocol + metaData + one add per data file under it +
    * `carried` adds (absolute-URI references into older version dirs).
    * Returns the adds it wrote (own-relative ++ carried), so the commit path
    * can feed the table-level continuous log without a second footer pass. */
  private[graft] def writeCommit0(
      spark: SparkSession,
      versionDir: Path,
      schema: StructType,
      partitionColumns: Seq[String],
      carried: Seq[Add] = Nil,
      footerStats: Option[Map[String, (Long, Map[String, (String, String, String)])]] = None): Seq[Add] = {
    val own = listOwnAdds(spark, versionDir, schema, footerStats)
    val now = System.currentTimeMillis()
    val actions: Seq[JObject] =
      JObject("commitInfo" -> JObject(
        "timestamp" -> JLong(now),
        "operation" -> JString("WRITE"),
        "operationParameters" -> JObject(Nil),
        "engineInfo" -> JString("graft-storage"))) ::
      JObject("protocol" -> JObject(
        "minReaderVersion" -> JInt(1),
        "minWriterVersion" -> JInt(2))) ::
      JObject("metaData" -> JObject(
        "id" -> JString(java.util.UUID.randomUUID.toString),
        "format" -> JObject("provider" -> JString("parquet"), "options" -> JObject(Nil)),
        "schemaString" -> JString(schema.json),
        "partitionColumns" -> JArray(partitionColumns.map(JString(_)).toList),
        "configuration" -> JObject(Nil),
        "createdTime" -> JLong(now))) ::
      (own ++ carried).map(addAction).toList
    val log = logFile(versionDir)
    Files.createDirectories(log.getParent)
    Files.write(log,
      actions.map(a => JsonMethods.compact(JsonMethods.render(a))).mkString("\n").getBytes("UTF-8"))
    own ++ carried
  }

  private def addAction(a: Add): JObject =
    JObject("add" -> JObject(
      "path" -> JString(a.path),
      "partitionValues" -> JObject(a.partitionValues.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }.toList),
      "size" -> JLong(a.size),
      "modificationTime" -> JLong(a.modificationTime),
      "dataChange" -> JBool(true),
      "stats" -> a.stats.map(JString(_)).getOrElse(JNothing)))

  /** The data files physically under `versionDir`, as relative adds with
    * footer-derived stats. Partition values come from `col=value` path
    * segments (the layout `DataFrame.write.partitionBy` produces). */
  private def listOwnAdds(
      spark: SparkSession, versionDir: Path, schema: StructType,
      footerStats: Option[Map[String, (Long, Map[String, (String, String, String)])]]): Seq[Add] = {
    val meta = footerStats.getOrElse(Storage.readFooterStats(spark, versionDir))
    dataFilesUnder(versionDir).map { f =>
      val rel = versionDir.relativize(f)
      val relStr = (0 until rel.getNameCount).map(rel.getName(_).toString).mkString("/")
      val partVals = (0 until rel.getNameCount - 1).map(rel.getName(_).toString)
        .filter(_.contains("="))
        .map { seg => val Array(k, v) = seg.split("=", 2); k -> v }.toMap
      Add(relStr, partVals, Files.size(f), Files.getLastModifiedTime(f).toMillis,
        meta.get(relStr).map { case (rows, cols) => statsJson(schema, rows, cols) })
    }
  }

  /** The protocol's per-file stats string. min/max only for columns whose
    * SPARK type renders unambiguously in JSON (integral, floating, string) —
    * date/timestamp/decimal footer stats are raw physical values (days,
    * micros, unscaled) that an external reader would misinterpret, so those
    * columns get numRecords-only skipping. */
  private def statsJson(
      schema: StructType, rows: Long, cols: Map[String, (String, String, String)]): String = {
    import org.apache.spark.sql.types._
    def typed(name: String, tag: String, v: String): Option[JValue] =
      schema.find(_.name == name).map(_.dataType).flatMap {
        case ByteType | ShortType | IntegerType | LongType if tag == "i" =>
          Some(JInt(BigInt(v)))
        case FloatType | DoubleType if tag == "f" => Some(JDouble(v.toDouble))
        case StringType if tag == "s" => Some(JString(v))
        case _ => None
      }
    def side(pick: ((String, String, String)) => (String, String)): List[(String, JValue)] =
      cols.toSeq.sortBy(_._1).flatMap { case (c, st) =>
        val (tag, v) = pick(st)
        typed(c, tag, v).map(c -> _)
      }.toList
    JsonMethods.compact(JsonMethods.render(JObject(
      "numRecords" -> JLong(rows),
      "minValues" -> JObject(side { case (t, mn, _) => (t, mn) }),
      "maxValues" -> JObject(side { case (t, _, mx) => (t, mx) }))))
  }

  /** Carry the previous version's adds for partitions NOT rewritten by this
    * commit, absolutized against the directory that owns their bytes. Pure
    * log-to-log metadata: no data directory is listed. Falls back to listing
    * only for pre-interop tables with no previous log. */
  private[graft] def carriedAdds(
      spark: SparkSession,
      table: Path,
      baseVersion: Option[Long],
      manifest: Map[String, Long],
      rewritten: Set[String],
      partCol: String): Seq[Add] = {
    val keep = manifest.view.filterKeys(!rewritten.contains(_)).toMap
    if (keep.isEmpty) return Nil
    val prevLog = baseVersion.map(b => logFile(table.resolve(s"v$b")))
    prevLog.filter(Files.exists(_)) match {
      case Some(log) =>
        val base = table.resolve(s"v${baseVersion.get}")
        readLog(log).adds
          .filter(a => keep.contains(partDirName(a, partCol)))
          .map(a => if (isAbsolute(a.path)) a
                    else a.copy(path = base.resolve(a.path).toUri.toString))
      case None => // legacy table: one listing per carried partition, once
        keep.toSeq.sortBy(_._1).flatMap { case (part, ver) =>
          val dir = table.resolve(s"v$ver").resolve(part)
          val Array(k, v) = part.split("=", 2)
          dataFilesUnder(dir).map(f => Add(f.toUri.toString, Map(k -> v),
            Files.size(f), Files.getLastModifiedTime(f).toMillis, None))
        }
    }
  }

  private def partDirName(a: Add, partCol: String): String =
    a.partitionValues.get(partCol).map(v => s"$partCol=$v").getOrElse("")

  private def isAbsolute(p: String): Boolean =
    p.startsWith("file:") || p.startsWith("/") || p.contains("://")

  private def dataFilesUnder(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.toArray.map(_.asInstanceOf[Path])
      .filter(p => p.getFileName.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .sortBy(_.toString).toSeq
    finally s.close()
  }

  // ---- read side (the "external engine" path) -----------------------------

  /** Parse a version directory's Delta log. */
  def readLog(log: Path): Snapshot = {
    require(Files.exists(log), s"no Delta log at $log")
    val lines = new String(Files.readAllBytes(log), "UTF-8").split("\n").filter(_.nonEmpty)
    var schemaJson = ""
    var partCols = Seq.empty[String]
    val adds = Seq.newBuilder[Add]
    lines.foreach { l =>
      JsonMethods.parse(l) match {
        case JObject(fields) => fields.foreach {
          case ("metaData", md) =>
            schemaJson = (md \ "schemaString").asInstanceOf[JString].s
            partCols = (md \ "partitionColumns").asInstanceOf[JArray]
              .arr.map(_.asInstanceOf[JString].s)
          case ("add", ad) =>
            adds += Add(
              (ad \ "path").asInstanceOf[JString].s,
              (ad \ "partitionValues") match {
                case JObject(pv) => pv.map { case (k, v) => k -> v.asInstanceOf[JString].s }.toMap
                case _ => Map.empty
              },
              (ad \ "size") match { case JLong(n) => n; case JInt(n) => n.toLong; case _ => 0L },
              (ad \ "modificationTime") match {
                case JLong(n) => n; case JInt(n) => n.toLong; case _ => 0L },
              (ad \ "stats") match { case JString(s) => Some(s); case _ => None })
          case _ => ()
        }
        case other => throw new IllegalStateException(s"bad Delta log line: $other")
      }
    }
    require(schemaJson.nonEmpty, s"Delta log $log has no metaData action")
    Snapshot(schemaJson, partCols, adds.result())
  }

  /** Read a committed version EXACTLY the way an external Delta engine
    * would: the log — not a directory listing — decides which files to
    * read, the metaData schemaString types the scan, and partition-column
    * values come from each add's `partitionValues` (they are NOT in the
    * data files). Used by the `io1` oracle row and DeltaInteropSpec. */
  def readSnapshot(spark: SparkSession, versionDir: Path): DataFrame = {
    val snap = readLog(logFile(versionDir))
    buildFrame(spark, versionDir, snap.schemaJson, snap.partitionColumns, snap.adds)
  }

  /** Materialize a set of adds against `root` (relative paths resolve under
    * it) with the declared schema — the shared tail of [[readSnapshot]] and
    * [[readTableSnapshot]]. */
  private def buildFrame(
      spark: SparkSession, root: Path, schemaJson: String,
      partitionColumns: Seq[String], adds: Seq[Add]): DataFrame = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val dataSchema = StructType(schema.filterNot(f => partitionColumns.contains(f.name)))
    def resolve(p: String): String =
      if (isAbsolute(p)) p else root.resolve(p).toString
    // zero add actions is a VALID Delta table (e.g. the v0 of a pruned
    // upsert bootstrapped from an empty batch) — empty frame, log's schema
    if (adds.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    adds.groupBy(_.partitionValues).toSeq.sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
      .map { case (pv, as) =>
        val base = spark.read.schema(dataSchema).parquet(as.map(a => resolve(a.path)): _*)
        partitionColumns.foldLeft(base) { (df, c) =>
          df.withColumn(c, lit(pv(c)).cast(schema(c).dataType))
        }.select(schema.map(f => org.apache.spark.sql.functions.col(f.name)): _*)
      }
      .reduce(_.unionByName(_))
  }

  // ---- table-level continuous log + checkpoints ---------------------------
  //
  // The per-version logs above make each committed SNAPSHOT externally
  // readable, but an external engine following the LIVE table would have to
  // re-point at `v<N>` on every commit. The table-level log is the standard
  // Delta shape at the table root: `_delta_log/<v padded>.json` per commit
  // with incremental add/remove actions (paths are table-root-relative
  // `v<N>/…`, or absolute URIs for shallow-clone carries), plus a protocol
  // checkpoint — `<v>.checkpoint.parquet` + `_last_checkpoint` — every
  // [[CheckpointInterval]] commits. A reader resolves `_last_checkpoint`,
  // loads ONE parquet, and replays only the trailing JSON commits: O(N)
  // per read on a long-lived table, never O(history). The writer's own
  // incremental-removes computation replays the same bounded window.
  //
  // Ordering/crash contract: the entry for v<N> is appended AFTER the CAS
  // promote of `v<N>` and BEFORE the `_LATEST` pointer swap, so writers
  // serialize through the pointer and at most ONE in-flight entry can be
  // ahead of the pointer after a crash; [[Storage.repairOrphans]] truncates
  // log entries above the committed pointer alongside the orphan version
  // directories they describe.

  private[graft] val CheckpointInterval = 10L
  private val LastCheckpoint = "_last_checkpoint"

  def tableLogDir(table: Path): Path = table.resolve(LogDirName)
  private def tableCommitFile(table: Path, v: Long): Path =
    tableLogDir(table).resolve(f"$v%020d.json")
  private[graft] def checkpointFile(table: Path, v: Long): Path =
    tableLogDir(table).resolve(f"$v%020d.checkpoint.parquet")
  private[graft] def lastCheckpointFile(table: Path): Path =
    tableLogDir(table).resolve(LastCheckpoint)

  /** Stable Delta table id (metaData.id): derived from the table path so
    * every commit and checkpoint of one table agrees without shared state. */
  private def tableId(table: Path): String =
    java.util.UUID.nameUUIDFromBytes(
      table.toAbsolutePath.toString.getBytes("UTF-8")).toString

  /** Append commit `v` to the table-level log. `fullAdds` is the COMPLETE
    * current file set (the per-version log's own ++ carried adds, own paths
    * already prefixed `v<N>/`); the incremental entry is computed against
    * the replayed previous state. Returns the checkpoint cut, deferred,
    * when one is due: this append runs INSIDE the rename→pointer-swap
    * window, and a Spark job there would stall every waiting writer —
    * the caller invokes the thunk after the pointer lands. */
  private[graft] def appendTableCommit(
      spark: SparkSession, table: Path, v: Long,
      schema: StructType, partitionColumns: Seq[String],
      fullAdds: Seq[Add]): Option[() => Unit] = {
    val logDir = tableLogDir(table)
    Files.createDirectories(logDir)
    val prev = replayState(spark, table, v - 1)
    val curPaths = fullAdds.map(_.path).toSet
    val removes = prev.valuesIterator.filterNot(a => curPaths.contains(a.path))
      .toSeq.sortBy(_.path)
    val newAdds = fullAdds.filterNot(a => prev.contains(a.path))
    val now = System.currentTimeMillis()
    val actions: Seq[JObject] =
      JObject("commitInfo" -> JObject(
        "timestamp" -> JLong(now),
        "operation" -> JString("WRITE"),
        "operationParameters" -> JObject(Nil),
        "engineInfo" -> JString("graft-storage"))) ::
      JObject("protocol" -> JObject(
        "minReaderVersion" -> JInt(1),
        "minWriterVersion" -> JInt(2))) ::
      JObject("metaData" -> JObject(
        "id" -> JString(tableId(table)),
        "format" -> JObject("provider" -> JString("parquet"), "options" -> JObject(Nil)),
        "schemaString" -> JString(schema.json),
        "partitionColumns" -> JArray(partitionColumns.map(JString(_)).toList),
        "configuration" -> JObject(Nil),
        "createdTime" -> JLong(now))) ::
      (removes.map(r => JObject("remove" -> JObject(
        "path" -> JString(r.path),
        "deletionTimestamp" -> JLong(now),
        "dataChange" -> JBool(true)))) ++ newAdds.map(addAction)).toList
    val tmp = logDir.resolve(s".commit-$v-${java.util.UUID.randomUUID}.tmp")
    Files.write(tmp,
      actions.map(a => JsonMethods.compact(JsonMethods.render(a))).mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, tableCommitFile(table, v),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    if (v > 0 && v % CheckpointInterval == 0)
      Some(() => writeCheckpoint(spark, table, v, schema, partitionColumns,
        fullAdds.sortBy(_.path)))
    else None
  }

  /** The protocol checkpoint for version `v`: ONE parquet file holding the
    * reconciled state (protocol + metaData + every live add), then the
    * `_last_checkpoint` pointer. Spark writes a directory, so the single
    * part-file is moved onto the protocol's `<v>.checkpoint.parquet` name. */
  private def writeCheckpoint(
      spark: SparkSession, table: Path, v: Long,
      schema: StructType, partitionColumns: Seq[String], state: Seq[Add]): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ckptSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType))), nullable = true),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("createdTime", LongType))), nullable = true),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType))), nullable = true)))
    val rows: Seq[Row] =
      Row(Row(1, 2), null, null) ::
      Row(null, Row(tableId(table), Row("parquet"), schema.json,
        partitionColumns, System.currentTimeMillis()), null) ::
      state.map(a => Row(null, null,
        Row(a.path, a.partitionValues, a.size, a.modificationTime, true,
          a.stats.orNull))).toList
    val tmpDir = tableLogDir(table).resolve(s".ckpt-$v-${java.util.UUID.randomUUID}")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ckptSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
    val s = Files.list(tmpDir)
    val part =
      try s.toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmpDir"))
      finally s.close()
    Files.move(part, checkpointFile(table, v),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Storage.deleteRecursively(tmpDir)
    val lcTmp = tableLogDir(table).resolve(s".$LastCheckpoint-${java.util.UUID.randomUUID}.tmp")
    Files.write(lcTmp, JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JLong(v), "size" -> JLong(rows.size.toLong)))).getBytes("UTF-8"))
    Files.move(lcTmp, lastCheckpointFile(table),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** After orphan truncation: re-point `_last_checkpoint` at the newest
    * SURVIVING checkpoint ≤ `cur`, or remove it only when none survives.
    * Deleting it outright would silently demote every later read (and the
    * next commit's replay) to O(history) JSON replay — and fail outright
    * if any pre-checkpoint JSON has been corrupted or aged out, a state
    * the checkpoint contract explicitly tolerates. */
  private[graft] def demoteLastCheckpoint(table: Path, cur: Long): Unit = {
    if (lastCheckpointVersion(table).forall(_ <= cur)) return
    val dir = tableLogDir(table)
    val s = Files.list(dir)
    val surviving =
      try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .collect { case n if n.matches("\\d{20}\\.checkpoint\\.parquet") =>
          n.stripSuffix(".checkpoint.parquet").toLong }
        .filter(_ <= cur).maxOption
      finally s.close()
    surviving match {
      case Some(v) =>
        // the protocol's `size` = checkpoint row count, read off the footer
        val rows = parquetRowCount(checkpointFile(table, v))
        val tmp = dir.resolve(s".$LastCheckpoint-${java.util.UUID.randomUUID}.tmp")
        Files.write(tmp, JsonMethods.compact(JsonMethods.render(JObject(
          "version" -> JLong(v), "size" -> JLong(rows)))).getBytes("UTF-8"))
        Files.move(tmp, lastCheckpointFile(table),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      case None => Files.deleteIfExists(lastCheckpointFile(table))
    }
  }

  private def parquetRowCount(f: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toUri),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** `_last_checkpoint`'s version, if a checkpoint exists. */
  private[graft] def lastCheckpointVersion(table: Path): Option[Long] = {
    val f = lastCheckpointFile(table)
    if (!Files.exists(f)) None
    else JsonMethods.parse(new String(Files.readAllBytes(f), "UTF-8")) \ "version" match {
      case JLong(n) => Some(n)
      case JInt(n)  => Some(n.toLong)
      case _        => None
    }
  }

  /** Live file set as of table-log commit `upTo`, replayed the protocol
    * way: the newest checkpoint at or below `upTo` seeds the state (one
    * parquet read), then ONLY the trailing `<v>.json` commits apply —
    * pre-checkpoint JSONs are never opened (DeltaInteropSpec corrupts them
    * and this path must not notice). */
  private[graft] def replayState(
      spark: SparkSession, table: Path, upTo: Long): Map[String, Add] = {
    if (upTo < 0) return Map.empty
    val state = scala.collection.mutable.LinkedHashMap.empty[String, Add]
    val ckpt = lastCheckpointVersion(table).filter(_ <= upTo)
    ckpt.foreach { c =>
      readCheckpointAdds(spark, table, c).foreach(a => state(a.path) = a)
    }
    (ckpt.map(_ + 1).getOrElse(0L) to upTo).foreach { v =>
      val f = tableCommitFile(table, v)
      if (Files.exists(f)) {
        val (adds, removePaths) = parseTableCommit(f)
        removePaths.foreach(state.remove)
        adds.foreach(a => state(a.path) = a)
      }
    }
    state.toMap
  }

  private def readCheckpointAdds(
      spark: SparkSession, table: Path, v: Long): Seq[Add] = {
    import org.apache.spark.sql.Row
    spark.read.parquet(checkpointFile(table, v).toString)
      .filter("add IS NOT NULL").select("add.*")
      .collect().toSeq.map { r =>
        Add(r.getAs[String]("path"),
          Option(r.getAs[Map[String, String]]("partitionValues")).getOrElse(Map.empty),
          r.getAs[Long]("size"), r.getAs[Long]("modificationTime"),
          Option(r.getAs[String]("stats")))
      }
  }

  private def parseTableCommit(log: Path): (Seq[Add], Seq[String]) = {
    val adds = Seq.newBuilder[Add]
    val removes = Seq.newBuilder[String]
    new String(Files.readAllBytes(log), "UTF-8").split("\n").filter(_.nonEmpty)
      .foreach { l =>
        JsonMethods.parse(l) match {
          case JObject(fields) => fields.foreach {
            case ("add", ad) =>
              adds += Add(
                (ad \ "path").asInstanceOf[JString].s,
                (ad \ "partitionValues") match {
                  case JObject(pv) => pv.map { case (k, vv) => k -> vv.asInstanceOf[JString].s }.toMap
                  case _ => Map.empty
                },
                (ad \ "size") match { case JLong(n) => n; case JInt(n) => n.toLong; case _ => 0L },
                (ad \ "modificationTime") match {
                  case JLong(n) => n; case JInt(n) => n.toLong; case _ => 0L },
                (ad \ "stats") match { case JString(st) => Some(st); case _ => None })
            case ("remove", rm) => removes += (rm \ "path").asInstanceOf[JString].s
            case _ => ()
          }
          case other => throw new IllegalStateException(s"bad Delta log line: $other")
        }
      }
    (adds.result(), removes.result())
  }

  /** Latest table-log commit version (the log's view — normally equal to
    * [[Storage.currentVersion]]). */
  private[graft] def latestTableCommit(table: Path): Option[Long] = {
    val dir = tableLogDir(table)
    if (!Files.isDirectory(dir)) return None
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
      .collect { case n if n.matches("\\d{20}\\.json") => n.stripSuffix(".json").toLong }
      .maxOption
    finally s.close()
  }

  /** Follow the LIVE table the way an external Delta engine does: resolve
    * `_last_checkpoint`, load the checkpoint parquet, replay only trailing
    * JSON commits, and materialize the resulting file set. The `io4` row
    * drives this against a >CheckpointInterval commit history. */
  def readTableSnapshot(spark: SparkSession, table: Path): DataFrame = {
    val vMax = latestTableCommit(table).getOrElse(
      throw new IllegalStateException(s"no table-level Delta log at $table"))
    // schema + partition columns from the newest commit's metaData (written
    // every commit), falling back to the checkpoint's copy
    val meta = declaredTableMeta(table, vMax)
    val state = replayState(spark, table, vMax).values.toSeq.sortBy(_.path)
    buildFrame(spark, table, meta._1, meta._2, state)
  }

  private def declaredTableMeta(table: Path, vMax: Long): (String, Seq[String]) = {
    val lines = new String(Files.readAllBytes(tableCommitFile(table, vMax)), "UTF-8")
      .split("\n").filter(_.contains("\"metaData\""))
    lines.iterator.map(JsonMethods.parse(_)).collectFirst {
      case JObject(fields) if fields.exists(_._1 == "metaData") =>
        val md = fields.collectFirst { case ("metaData", m) => m }.get
        ((md \ "schemaString").asInstanceOf[JString].s,
          (md \ "partitionColumns").asInstanceOf[JArray].arr
            .map(_.asInstanceOf[JString].s))
    }.getOrElse(throw new IllegalStateException(
      s"table-log commit $vMax at $table has no metaData action"))
  }
}

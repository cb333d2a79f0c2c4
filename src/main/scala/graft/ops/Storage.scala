package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table storage with transaction-like replacement semantics (SURVEY.md §2.7
  * M4): the reference wraps its SCD2 close+insert in `BEGIN…COMMIT`
  * (dwh_dim_character.py:53,116). Parquet has no cross-statement
  * transactions, so the equivalent is: compute the table's ENTIRE next state
  * in one job, write it to a temp directory, then atomically swap directory
  * names. Readers see the old state or the new state, never a mix. On a real
  * deployment the same call sites map 1:1 onto Delta/Iceberg MERGE commits.
  *
  * Scale note: the swap is a metadata operation — cost is independent of
  * table size; the write is the usual distributed parquet write.
  */
object Storage {

  def read(spark: SparkSession, table: Path): DataFrame = {
    recover(table)
    spark.read.parquet(table.toString)
  }

  /** Read `table` if it exists, else `empty` — the ONLY correct
    * first-run/bootstrap check on a managed table. Recovery runs before
    * the existence test so a crash inside [[atomicReplace]]'s swap window
    * (only `.old` present) reads as the previous state, not as "table
    * never existed" — a bare `Files.exists` there would silently rebuild
    * the layer from empty, losing audit history and SK continuity. */
  def readOr(spark: SparkSession, table: Path, empty: => DataFrame): DataFrame = {
    recover(table)
    if (Files.exists(table)) spark.read.parquet(table.toString) else empty
  }

  /** Write `next` as the new content of `table` via write-temp-then-swap.
    *
    * Crash safety (single-writer): each individual move is atomic, but the
    * two-move swap has a window where only `.old` exists — [[recover]]
    * (called by [[read]] and on entry here) rolls the table back to the
    * old state if a crash hit that window, so no state is ever lost.
    * CONCURRENT readers during the window would see path-not-found; true
    * reader isolation needs a pointer/log layer, which is exactly what the
    * documented Delta/Iceberg mapping provides at deploy. */
  def atomicReplace(next: DataFrame, table: Path): Unit = {
    recover(table)
    val tmp = table.resolveSibling(table.getFileName.toString + ".tmp")
    val old = table.resolveSibling(table.getFileName.toString + ".old")
    deleteRecursively(tmp)
    next.write.mode("overwrite").parquet(tmp.toString)
    deleteRecursively(old)
    if (Files.exists(table)) Files.move(table, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, table, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Roll back a swap interrupted between its two moves: the table path is
    * gone but `.old` holds the complete previous state. Public because
    * ANY existence check on a managed table must recover first — a bare
    * `Files.exists` would read an interrupted swap as "table never
    * existed" and silently rebuild from empty state. */
  def recover(table: Path): Unit = {
    val old = table.resolveSibling(table.getFileName.toString + ".old")
    if (!Files.exists(table) && Files.exists(old))
      Files.move(old, table, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Deploy-shape layout: a table partitioned by low-cardinality columns
    * (load date, region, …) so predicate pushdown becomes partition
    * PRUNING — the scan never opens non-matching directories. Dynamic
    * partition overwrite replaces only the partitions present in `df`
    * (the incremental-load write mode). */
  def writePartitioned(df: DataFrame, table: Path, partitionCols: Seq[String]): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(table.toString)

  // ---- versioned commit log ----------------------------------------------
  //
  // atomicReplace has one documented hole: CONCURRENT readers during its
  // two-move swap window see path-not-found. The fix is the minimal form of
  // the Delta/Iceberg idea — never move data directories at all. Each commit
  // writes a brand-new immutable version directory `v<N>` and then atomically
  // swaps a one-line pointer file `_LATEST`. Readers resolve the pointer and
  // read that directory: they see the old version or the new version, never
  // a missing path, and a long-running scan that resolved `v3` keeps reading
  // `v3` even while `v4` commits underneath it (snapshot isolation for the
  // duration of the job). Old versions are vacuumed only AFTER the pointer
  // moves on, with a keep-window for in-flight readers.
  //
  // Commit cost is one small-file write + one rename — metadata-only,
  // independent of table size, same as atomicReplace. Crash safety
  // (single-writer, matching atomicReplace's contract): a crash before the
  // pointer swap leaves an orphan `v<N>` directory that the next commit
  // deletes and rewrites; the pointer still names the last complete version,
  // so no torn state is ever visible.

  private val Latest = "_LATEST"

  /** The committed version number, or None for an empty/new table. */
  def currentVersion(table: Path): Option[Long] = {
    val ptr = table.resolve(Latest)
    if (Files.exists(ptr))
      Some(new String(Files.readAllBytes(ptr), "UTF-8").trim.stripPrefix("v").toLong)
    else None
  }

  /** Commit `next` as the new version of `table`; returns the new version
    * number. `keepVersions` older versions are retained for in-flight
    * readers before vacuum. */
  def commitVersion(next: DataFrame, table: Path, keepVersions: Int = 1): Long = {
    require(keepVersions >= 1, s"keepVersions must be >= 1 (got $keepVersions)")
    Files.createDirectories(table)
    val v = currentVersion(table).getOrElse(-1L) + 1
    val dir = table.resolve(s"v$v")
    deleteRecursively(dir) // orphan from a pre-pointer-swap crash
    next.write.mode("overwrite").parquet(dir.toString)
    val tmp = table.resolve(Latest + ".tmp")
    Files.write(tmp, s"v$v".getBytes("UTF-8"))
    Files.move(tmp, table.resolve(Latest), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // vacuum: only versions strictly older than the keep-window, so a reader
    // that resolved its directory just before this commit still has it
    (0L until (v - keepVersions)).foreach(o => deleteRecursively(table.resolve(s"v$o")))
    v
  }

  /** Read the committed version of a versioned table. The returned frame is
    * pinned to the directory resolved HERE — later commits don't disturb it. */
  def readVersion(spark: SparkSession, table: Path): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed version at $table"))
    spark.read.parquet(table.resolve(s"v$v").toString)
  }

  /** Time travel: read a specific retained version (within the commit's
    * `keepVersions` window — vacuumed versions are gone). */
  def readVersionAt(spark: SparkSession, table: Path, v: Long): DataFrame = {
    val dir = table.resolve(s"v$v")
    val cur = currentVersion(table)
    require(Files.exists(dir) && cur.exists(v <= _),
      s"version $v not retained at $table (current=$cur)")
    spark.read.parquet(dir.toString)
  }

  /** [[readVersion]] with a bootstrap default, mirroring [[readOr]].
    * A directory that exists but is NOT a versioned layout (a flat
    * atomicReplace-era table, say) fails loudly instead of reading as
    * "never existed" — silently bootstrapping a populated layer from
    * empty loses audit history and restarts SK sequences, the exact
    * failure [[readOr]]'s recover-first contract exists to prevent. */
  def readVersionOr(spark: SparkSession, table: Path, empty: => DataFrame): DataFrame =
    currentVersion(table) match {
      case Some(v) => spark.read.parquet(table.resolve(s"v$v").toString)
      case None =>
        if (Files.isDirectory(table)) {
          val s = Files.list(table)
          val foreign =
            try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
              .filterNot(n => n.matches("v\\d+") || n.startsWith(Latest))
            finally s.close()
          require(foreign.isEmpty,
            s"$table exists but is not a versioned table (found: " +
              s"${foreign.take(3).mkString(", ")}) — refusing to treat it as " +
              "empty; migrate with commitVersion(read(spark, table), table)")
        }
        empty
    }

  /** Small-file compaction: rewrite `table` into ⌈bytes/targetBytes⌉
    * files via a narrow coalesce (no shuffle) + [[atomicReplace]].
    * Incremental loads accrete one file per micro-batch/run; thousands of
    * tiny files turn a 100 TB scan into a metadata storm (one task + one
    * open per file), so compaction is scheduled maintenance, not an
    * optimization. Returns the target file count. */
  def compact(spark: SparkSession, table: Path, targetBytes: Long = 128L << 20): Int =
    currentVersion(table) match {
      // versioned table: compaction is just another commit of the latest
      // snapshot, rewritten into fewer files — never touch the layout
      // (walking the directory would read EVERY retained version and an
      // atomicReplace would destroy the v*/_LATEST structure)
      case Some(v) =>
        val dir = table.resolve(s"v$v")
        val n = fileCountFor(dir, targetBytes)
        commitVersion(spark.read.parquet(dir.toString).coalesce(n), table)
        n
      case None =>
        recover(table)
        val n = fileCountFor(table, targetBytes)
        atomicReplace(spark.read.parquet(table.toString).coalesce(n), table)
        n
    }

  private def fileCountFor(dir: Path, targetBytes: Long): Int = {
    val s = Files.walk(dir)
    val bytes =
      try s.filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .mapToLong(Files.size).sum()
      finally s.close()
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p) // close: Files.walk leaks an fd per call otherwise
      try s.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }

  def path(dir: String, name: String): Path = Paths.get(dir, name)
}

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

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p) // close: Files.walk leaks an fd per call otherwise
      try s.sorted(java.util.Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }

  def path(dir: String, name: String): Path = Paths.get(dir, name)
}

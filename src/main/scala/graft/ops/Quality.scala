package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Constraint auditing (SURVEY.md §1.3): Postgres enforced PRIMARY KEY /
  * FOREIGN KEY / NOT NULL declaratively; Spark enforces nothing, so the
  * engine upholds them by construction (dedup before write, FK resolution
  * via joins) and VERIFIES them with these relational audits — each audit
  * is itself a distributed query (one aggregation or anti-join), usable as
  * a data-quality gate at any scale.
  */
object Quality {

  /** PK audit: keys appearing more than once. Empty ⇔ constraint holds. */
  def primaryKeyViolations(df: DataFrame, pk: Seq[String]): DataFrame =
    df.groupBy(pk.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** FK audit: child keys with no parent (NULL fk = no reference, allowed —
    * matching SQL FK semantics). Empty ⇔ constraint holds. */
  def foreignKeyViolations(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .distinct()

  /** Malformed-payload predicate for a schema-on-read raw layer: TRUE for
    * rows whose non-null JSON payload fails to parse against `ddlSchema`.
    * PERMISSIVE `from_json` does NOT null the struct on bad input — it
    * nulls the fields — so the reliable signal is the standard
    * `_corrupt_record` idiom: add the corrupt-record column to the parse
    * schema; it is non-null exactly for unparseable payloads. Pure
    * map-side expression, usable as a filter into a quarantine table at
    * any scale (the reference's raw layer ingests payloads unvalidated;
    * configure.py:58-62 — this is the missing gate). */
  def malformedJson(payload: org.apache.spark.sql.Column, ddlSchema: String): org.apache.spark.sql.Column =
    payload.isNotNull &&
      parseJsonWithQuarantine(payload, ddlSchema).getField("_corrupt_record").isNotNull

  /** One-parse quarantine + extraction: a struct of `ddlSchema`'s fields
    * plus `_corrupt_record` (non-null ⇔ the payload failed to parse).
    * Callers needing BOTH the typed fields and the quarantine flag derive
    * them from this single column so the JSON parses once (two
    * differently-schemed from_json calls cannot share a subexpression —
    * measured 2× the parse cost in dq2). */
  def parseJsonWithQuarantine(payload: org.apache.spark.sql.Column, ddlSchema: String): org.apache.spark.sql.Column = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddlSchema)
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    from_json(payload, schema, Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
  }

  /** NOT NULL audit: per-column null counts for the declared columns. */
  def notNullViolations(df: DataFrame, cols: Seq[String]): DataFrame = {
    val counts = cols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c))
    df.agg(counts.head, counts.tail: _*)
      .selectExpr(s"stack(${cols.length}, " +
        cols.map(c => s"'$c', `$c`").mkString(", ") + ") as (column_name, n_nulls)")
      .filter(col("n_nulls") > 0)
  }

  /** Thrown by [[enforce]]: the batch violates a declared constraint and
    * must not commit. Carries per-constraint violation counts. */
  final class ConstraintViolation(msg: String) extends RuntimeException(msg)

  /** ENFORCED constraints — the write-time half of the audit family
    * (Delta's CHECK/NOT NULL table constraints, Postgres's enforced DDL):
    * validate `df` against the declared NOT NULLs, named CHECK
    * predicates, and a unique key, throwing [[ConstraintViolation]] with
    * every violated constraint's count when any fail; returns `df`
    * unchanged for chaining into a commit. The write never lands partial:
    * enforce-then-commit keeps the table's invariants by construction,
    * not by after-the-fact audit.
    *
    * Cost shape at scale: NOT NULL + CHECK fold into ONE map-side
    * combinable aggregate pass (O(batch), no shuffle); the unique-key
    * probe is a groupBy on the key — the same shuffle layout the upsert
    * that follows would pay anyway. A CHECK predicate that evaluates
    * NULL counts as a violation here (stricter than SQL's accept-UNKNOWN)
    * because a pipeline invariant that silently admits NULL rows is the
    * bug this exists to catch; wrap the predicate in coalesce to opt out.
    *
    * NOTE: this validates-then-returns, so the caller's commit re-scans
    * the source — a NON-DETERMINISTIC source can pass here yet commit
    * different rows. Committing callers should use [[enforcedCommit]],
    * which materializes the batch once and validates and commits the same
    * bytes (and adds FOREIGN KEY probes). */
  def enforce(df: DataFrame,
      notNull: Seq[String] = Seq.empty,
      checks: Map[String, org.apache.spark.sql.Column] = Map.empty,
      uniqueKey: Seq[String] = Seq.empty): DataFrame = {
    val viols = scala.collection.mutable.ListBuffer.empty[String]
    val aggs =
      notNull.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c")) ++
      checks.toSeq.sortBy(_._1).map { case (n, p) =>
        sum(when(p.isNull || !p, 1L).otherwise(0L)).as(s"__ck_$n") }
    if (aggs.nonEmpty) {
      val row = df.agg(aggs.head, aggs.tail: _*).first()
      notNull.foreach { c =>
        val n = row.getAs[Long](s"__nn_$c")
        if (n > 0) viols += s"NOT NULL $c: $n null row(s)"
      }
      checks.keys.toSeq.sorted.foreach { n =>
        val k = row.getAs[Long](s"__ck_$n")
        if (k > 0) viols += s"CHECK $n: $k violating row(s)"
      }
    }
    if (uniqueKey.nonEmpty) {
      val dups = df.groupBy(uniqueKey.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
      if (dups > 0)
        viols += s"UNIQUE (${uniqueKey.mkString(", ")}): $dups duplicated key(s)"
    }
    if (viols.nonEmpty)
      throw new ConstraintViolation(
        s"batch violates ${viols.size} constraint(s) — refusing to commit: " +
          viols.mkString("; "))
    df
  }

  /** A declared FOREIGN KEY for [[enforcedCommit]]: `childKey` in the
    * batch must resolve into `parent`'s `parentKey` (NULL = no reference,
    * allowed — SQL FK semantics). `name` labels the violation message. */
  final case class ForeignKey(name: String, childKey: String,
      parent: DataFrame, parentKey: String)

  /** Enforce-then-commit with the batch scanned ONCE — the write-time
    * constraint gate (the reference declares its FKs and NOT NULLs in DDL;
    * /root/reference/dags/configure.py:344-377 — enforced there by
    * Postgres, upheld here at commit time):
    *
    *  1. the source plan materializes in a single pass (localCheckpoint),
    *     during which the NOT NULL / CHECK counters are collected as
    *     [[org.apache.spark.sql.Observation]] metrics riding that same
    *     scan — zero extra passes over the source, and a
    *     non-deterministic source (a fresh extract, a sampled feed)
    *     cannot pass validation with one set of rows and commit another;
    *  2. the UNIQUE-key probe and every [[ForeignKey]] anti-join probe run
    *     against the MATERIALIZED batch (checkpoint blocks, not the
    *     source) — the FK probe is O(batch ⋈ parent-keys), the same
    *     shuffle the BK→SK resolution that follows would pay;
    *  3. only a fully clean batch commits (through the table's CAS log);
    *     any violation throws [[ConstraintViolation]] with every failed
    *     constraint's count and nothing lands — the table keeps serving
    *     its previous version.
    *
    * Returns the committed version. Cost at scale: one source scan + one
    * local materialization + O(batch) probe shuffles; the parent sides of
    * FK probes should be the dimension tables — small enough that Spark
    * broadcasts them under AQE. */
  def enforcedCommit(df: DataFrame, table: java.nio.file.Path,
      notNull: Seq[String] = Seq.empty,
      checks: Map[String, org.apache.spark.sql.Column] = Map.empty,
      uniqueKey: Seq[String] = Seq.empty,
      foreignKeys: Seq[ForeignKey] = Seq.empty,
      keepVersions: Int = 1): Long = {
    val aggs =
      notNull.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c")) ++
      checks.toSeq.sortBy(_._1).map { case (n, p) =>
        sum(when(p.isNull || !p, 1L).otherwise(0L)).as(s"__ck_$n") }
    val obs = new org.apache.spark.sql.Observation()
    val observed =
      if (aggs.nonEmpty) df.observe(obs, aggs.head, aggs.tail: _*) else df
    // the ONLY scan of the source: the observation's counters populate
    // while the batch materializes into local blocks
    val staged = observed.localCheckpoint()
    try {
      val viols = scala.collection.mutable.ListBuffer.empty[String]
      if (aggs.nonEmpty) {
        val m = obs.get
        notNull.foreach { c =>
          val n = m(s"__nn_$c").asInstanceOf[Long]
          if (n > 0) viols += s"NOT NULL $c: $n null row(s)"
        }
        checks.keys.toSeq.sorted.foreach { n =>
          val k = m(s"__ck_$n").asInstanceOf[Long]
          if (k > 0) viols += s"CHECK $n: $k violating row(s)"
        }
      }
      if (uniqueKey.nonEmpty) {
        val dups = staged.groupBy(uniqueKey.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
        if (dups > 0)
          viols += s"UNIQUE (${uniqueKey.mkString(", ")}): $dups duplicated key(s)"
      }
      foreignKeys.foreach { fk =>
        val orphans = foreignKeyViolations(
          staged, fk.childKey, fk.parent, fk.parentKey).count()
        if (orphans > 0)
          viols += s"FOREIGN KEY ${fk.name} (${fk.childKey} → ${fk.parentKey}): " +
            s"$orphans orphaned key(s)"
      }
      if (viols.nonEmpty)
        throw new ConstraintViolation(
          s"batch violates ${viols.size} constraint(s) — refusing to commit: " +
            viols.mkString("; "))
      // the commit reads the SAME materialized blocks validation saw
      Storage.commitVersion(staged, table, keepVersions = keepVersions)
    } finally staged.unpersist()
  }
}

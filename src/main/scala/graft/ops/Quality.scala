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
}

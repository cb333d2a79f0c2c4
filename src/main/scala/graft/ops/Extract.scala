package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Staging-layer scalar extraction operators (SURVEY.md §2.2, §2.3).
  *
  * Re-expresses the reference's Postgres JSON/string idioms as codegen-friendly
  * Spark built-ins (no UDFs — everything stays inside whole-stage codegen):
  *  - P1/P2 `payload ->> 'k'` / `payload -> 'a' ->> 'b'`  → `get_json_object`
  *    (ref: stg_character.py:53-61, 107-108)
  *  - P5 `NULLIF(TRIM(x), '')`                            → [[nullifEmpty]]
  *    (ref: stg_character.py:108,132)
  *  - P6/P7 regex-guarded `to_date(x, 'Month DD, YYYY')`  → [[guardedDate]]
  *    (ref: stg_episode.py:49-53)
  *  - A1-A3 `jsonb_array_elements_text(payload -> 'k')`   → [[jsonArrayText]]
  *    + `explode` (ref: stg_character.py:165-171) — `explode`, not
  *    `explode_outer`: Postgres emits 0 rows for empty arrays.
  */
object Extract {

  /** P1: top-level JSON text extraction, `payload ->> field`. */
  def jsonText(payload: Column, field: String): Column =
    get_json_object(payload, s"$$.$field")

  /** P2: nested JSON path, `payload -> a ->> b`. */
  def jsonPath(payload: Column, path: String*): Column =
    get_json_object(payload, "$." + path.mkString("."))

  /** P3: `(payload ->> field)::int`. Spark cast nulls on garbage, same
    * non-strict behavior the clean API ids make irrelevant. */
  def jsonInt(payload: Column, field: String): Column =
    jsonText(payload, field).cast("int")

  /** P4: `(payload ->> field)::timestamptz` for ISO-8601 strings. */
  def jsonTimestamp(payload: Column, field: String): Column =
    to_timestamp(jsonText(payload, field))

  /** P5: `NULLIF(TRIM(c), '')` — empty-string-means-missing normalization. */
  def nullifEmpty(c: Column): Column = {
    val t = trim(c)
    when(t === "", lit(null).cast("string")).otherwise(t)
  }

  /** P6+P7: regex-guarded date parse of `"December 2, 2013"`-style text.
    * Postgres `to_date(x, 'Month DD, YYYY')` ≈ Java `"MMMM d, yyyy"` under the
    * CORRECTED parser; the rlike guard nulls malformed rows instead of failing. */
  val monthDdYyyy = "^[A-Za-z]+ [0-9]{1,2}, [0-9]{4}$"
  def guardedDate(c: Column): Column =
    // try_to_date, not to_date: the regex admits abbreviated months
    // ("Dec 2, 2013") which MMMM rejects — under ANSI (Spark 4 default)
    // a plain to_date would throw instead of nulling
    when(c.rlike(monthDdYyyy), try_to_date(c, "MMMM d, yyyy"))
      .otherwise(lit(null).cast("date"))

  /** A1-A3: JSON string-array field → ArrayType(StringType) column, ready for
    * `explode`. One `from_json` per array (single parse). */
  def jsonArrayText(payload: Column, field: String): Column =
    from_json(jsonText(payload, field),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  /** Null-safe per-column equality, the building block of F2
    * (`IS DISTINCT FROM` change detection, ref: dwh_dim_character.py:63-69).
    * Spark `<=>` is `EqualNullSafe` — exact semantic match, hash-join safe. */
  def sameNullSafe(a: Column, b: Column): Column = a <=> b

  /** F2: row "changed" iff ANY tracked column pair differs (NULL == NULL). */
  def anyChanged(pairs: Seq[(Column, Column)]): Column =
    !pairs.map { case (a, b) => a <=> b }.reduce(_ && _)
}

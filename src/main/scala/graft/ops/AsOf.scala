package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical "operator Spark lacks" from
  * the builder brief. For each left row (key, t) attach the right row with
  * the greatest t' ≤ t for the same key (LEFT semantics: no prior right
  * row → nulls).
  *
  * Implementation is compose-first (brief's preference order (a)): the
  * union-sort formulation — tag both inputs, union, ONE per-key sort by
  * (time, right-before-left), then `last(col, ignoreNulls)` carries each
  * right value forward to the left rows that follow it.
  *
  * Why not a range join: `l JOIN r ON l.key = r.key AND r.t <= l.t` +
  * argmax explodes to O(|matches|) pairs before pruning — quadratic per
  * key. The union-sort runs in O(n log n) per key, one shuffle, no
  * intermediate blowup — the same plan shape a native AsOfJoinExec would
  * produce, with AQE/codegen for free.
  *
  * Determinism: callers must dedupe the right side per (key, time) first
  * (latestByKey) — otherwise "the" right row at a timestamp is arbitrary.
  */
object AsOf {

  /** Backward as-of: greatest right t' ≤ left t.
    * @param rightValueCols right-side payload columns to carry (must not
    *                       collide with left column names) */
  def asofJoinLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, rightValueCols, forward = false)

  /** Forward as-of: SMALLEST right t' ≥ left t (next event at-or-after) —
    * e.g. "first purchase following each impression". Same union-sort
    * plan with the time axis reversed; DuckDB expresses it as
    * `ASOF LEFT JOIN … ON l.t <= r.t`. */
  def asofJoinLeftForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String]): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, rightValueCols, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightValueCols: Seq[String],
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    // All payload columns ride in ONE struct that is non-null on every right
    // row: last(ignoreNulls) then carries the whole matched row, so (a) a
    // legitimately-NULL payload value survives (it doesn't fall through to a
    // stale earlier row), and (b) all values provably come from the SAME
    // right row — true ASOF semantics (cf. DuckDB ASOF JOIN).
    val payloadT = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)))
    // right rows: time under the LEFT time column name so the union sorts
    // both sides on one axis; side=0 sorts right rows first at equal time
    // (≤ semantics: a right row AT t is visible to left rows at t).
    // NULL-key right rows are DROPPED: an ASOF equi-join never matches
    // NULL = NULL (cf. DuckDB ASOF JOIN), but Window.partitionBy groups
    // NULLs together and would fabricate matches for NULL-key left rows
    // (which instead pass through with NULL payload, like a left join).
    // NULL-TIME right rows are dropped for the same reason: they have no
    // position on the time axis ("NULL ≤ t" is never true), yet ascending
    // sort puts NULLs FIRST, where last(ignoreNulls) would carry their
    // payload into every backward match.
    val taggedRight = right.filter(col(key).isNotNull && col(rightTime).isNotNull).select(
      col(key), col(rightTime).as(leftTime),
      struct(rightValueCols.map(col): _*).as("__payload"),
      lit(0).as("__side"))
    val taggedLeft = left.select(
      leftCols.map(col) ++ Seq(
        lit(null).cast(payloadT).as("__payload"), lit(1).as("__side")): _*)

    val all = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // forward: traverse time DESCENDING, so "carry the last right row
    // seen" becomes "nearest right row at-or-after". __side stays
    // ascending either way: the right row AT t sorts before left rows at
    // t, making both bounds inclusive.
    val timeOrder = if (forward) col(leftTime).desc else col(leftTime).asc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    all.withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      // a NULL-time left row has no as-of position either ("t' ≤ NULL" is
      // never true) → NULL payload; without the guard the forward sort
      // (desc, NULLs LAST) would hand it the smallest-time right row
      .select(leftCols.map(col) ++
        rightValueCols.map(c =>
          when(col(leftTime).isNotNull, col(s"__asof.$c")).as(c)): _*)
  }
}

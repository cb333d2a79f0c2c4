package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (BASELINE.json north star).
  *
  * Determinism strategy: dot products are folded in DECIMAL, which is exact
  * and order-independent — the same value to the last bit no matter how Spark
  * partitions the fold, and bit-identical to a DuckDB oracle computing the
  * same decimal sum. The final cast to double is a single well-defined
  * rounding. Float accumulation would differ run-to-run and engine-to-engine.
  *
  * Scale notes:
  *  - [[bruteForceTopK]] broadcasts the (single-row) query and scans once —
  *    O(n·d), embarrassingly parallel, no shuffle except the global top-k
  *    (which is a TakeOrdered, not a sort).
  *  - [[lshBuckets]] gives the sub-linear path: sign-of-dot-product against a
  *    fixed set of hyperplanes → candidates share a bucket; probe cost is
  *    O(bucket) not O(n). Hyperplanes are data-derived (first H vectors) so
  *    the whole pipeline stays deterministic and oracle-checkable.
  */
object Similarity {

  // Element (12,10) → product (25,20). Accumulator (30,22): the fold's
  // add yields (31,22) which re-casts to (30,22) EXACTLY (the integer part
  // of a ≤4096-dim dot of unit-ish vectors needs ≤5 digits) — precision
  // never hits Spark's 38 cap, so no silent scale reduction anywhere.
  private val ElemDec = "decimal(12,10)"
  private val AccDec = "decimal(30,22)"

  /** Exact decimal dot product of two array<float/double> columns. */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      // widen float→double BEFORE the decimal cast: Spark decimal-izes
      // floating point via its shortest string form, and a raw float's ~8
      // significant digits would lose precision the oracle keeps
      zip_with(a, b, (x, y) => x.cast("double").cast(ElemDec) * y.cast("double").cast(ElemDec)),
      lit(java.math.BigDecimal.ZERO).cast(AccDec),
      (acc, x) => (acc + x.cast(AccDec)).cast(AccDec))

  /** Dot product as double (single rounding from the exact decimal). */
  def dot(a: Column, b: Column): Column = dotDec(a, b).cast("double")

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, deterministic per the decimal strategy above. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors of one query vector.
    * `queryVec` must be a one-row DataFrame with column `qe`. */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryVec: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    embeddings
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), cosine(col(vecCol), col("qe")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Sign-bucket key over `planes` hyperplane vectors (one-row DataFrame with
    * an array-of-arrays column `planes`): bit i = [dot(v, plane_i) > 0].
    * Vectors in the same bucket are ANN candidates. */
  def lshBucket(vec: Column, planes: Column): Column =
    aggregate(
      zip_with(planes, sequence(lit(0), size(planes) - 1),
        (p, i) => when(dotDec(vec, p) > lit(java.math.BigDecimal.ZERO).cast(AccDec),
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** Bucketed ANN top-k: restrict the scan to the query's LSH bucket, then
    * exact cosine within it. Returns (vec_id, cos_sim). */
  def lshTopK(
      embeddings: DataFrame,
      queryVec: DataFrame,
      planesDf: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val bucketed = embeddings.crossJoin(broadcast(planesDf))
      .withColumn("__bucket", lshBucket(col(vecCol), col("planes")))
    val qB = queryVec.crossJoin(broadcast(planesDf))
      .withColumn("__bucket", lshBucket(col("qe"), col("planes")))
      .select(col("__bucket"), col("qe"))
    bucketed.join(broadcast(qB), Seq("__bucket"))
      .select(col(idCol), cosine(col(vecCol), col("qe")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}

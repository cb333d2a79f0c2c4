package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (BASELINE.json north star).
  *
  * Determinism strategy — fixed-point integer arithmetic:
  * elements quantize to integer units of 1e-10 via `floor(x * 1e10)`.
  * `floor` on identical IEEE doubles is identical everywhere — unlike
  * rounding casts, it has NO tie-breaking mode (Spark decimal casts round
  * HALF_UP from exact decimal expansions; DuckDB rounds HALF_EVEN after a
  * double multiply — they disagree on near-midpoint values). Dot products
  * then fold the unit integers exactly in DECIMAL, which is
  * order-independent, so results are bit-identical under any partitioning
  * and engine. The final cast to double is one well-defined rounding.
  *
  * Scale notes:
  *  - [[bruteForceTopK]] broadcasts the (single-row) query and scans once —
  *    O(n·d), embarrassingly parallel; the global top-k is a TakeOrdered,
  *    not a sort.
  *  - [[lshBuckets]] is the sub-linear path: sign-of-dot-product against a
  *    fixed hyperplane set → candidates share a bucket; probe cost is
  *    O(bucket) not O(n). Hyperplanes are data-derived so the pipeline
  *    stays deterministic.
  */
object Similarity {

  private val Scale = 1e10
  // units ≤ ~1e10 per element (11 digits); product ≤ 1e20 (23 digits);
  // 4096-dim sum ≤ ~4e23 (27 digits) — far from Spark's 38-digit cap, so
  // no silent scale reduction anywhere in the fold
  private val UnitDec = "decimal(14,0)"
  private val AccDec = "decimal(28,0)"

  /** Element quantization: integer units of 1e-10. */
  private def units(x: Column): Column =
    floor(x.cast("double") * lit(Scale)).cast(UnitDec)

  /** Exact dot product in integer units (value × 1e20), as decimal.
    * Delegates to the codegen'd [[graft.plans.FixedPointDot]] expression —
    * one tight 128-bit loop per row instead of a per-element Decimal fold
    * (verified bit-identical in FixedPointDotSpec). */
  def dotUnits(a: Column, b: Column): Column =
    graft.plans.FixedPointDot.dot(a, b).cast(AccDec)

  /** Reference higher-order-function formulation of [[dotUnits]] — kept for
    * the differential test against the fused expression. */
  def dotUnitsHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => units(x) * units(y)),
      lit(java.math.BigDecimal.ZERO).cast(AccDec),
      (acc, x) => (acc + x).cast(AccDec))

  /** Dot product as a double value (units / 1e20, one rounding each). */
  def dot(a: Column, b: Column): Column =
    dotUnits(a, b).cast("double") / lit(Scale * Scale)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. The 1e-20 unit factor cancels in the ratio, so
    * this is computed purely from the exact unit integers.
    *
    * Zero-norm (all elements < 1e-10) or empty vectors have no defined
    * angle → NULL, not 0/0 = NaN. This matters for ranking: Spark sorts
    * NaN ABOVE every real double, so an unguarded NaN row would outrank
    * every true neighbor in a top-k; NULLs sort last under desc. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dotUnits(a, a).cast("double")) * sqrt(dotUnits(b, b).cast("double"))
    when(denom > 0, dotUnits(a, b).cast("double") / denom)
      .otherwise(lit(null).cast("double"))
  }

  /** Brute-force top-k cosine neighbors of one query vector.
    * `queryVec` must be a one-row DataFrame with column `qe`. */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryVec: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // hoist the query's own norm out of the scan: computing dotUnits(qe,qe)
    // inside the per-row expression would redo a d-element fold per row
    val q = queryVec.select(col("qe"),
      sqrt(dotUnits(col("qe"), col("qe")).cast("double")).as("__qnorm"))
    val denom = sqrt(dotUnits(col(vecCol), col(vecCol)).cast("double")) * col("__qnorm")
    embeddings
      .crossJoin(broadcast(q))
      .select(col(idCol),
        // NULL (sorts last), not NaN (sorts FIRST under desc), for
        // zero-norm vectors — see cosine()
        when(denom > 0, dotUnits(col(vecCol), col("qe")).cast("double") / denom)
          .otherwise(lit(null).cast("double")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k neighbors for a BATCH of queries — the serving shape: a
    * retrieval tier answers Q queries per scan, not one. `queries` is
    * (queryIdCol, qe); each query's exact cosine top-k over the corpus
    * returns as (queryIdCol, idCol, cos_sim, rk).
    *
    * Scale shape: ONE corpus scan joined against the broadcast query
    * batch (Q bounded — a serving micro-batch), then a per-query
    * rank-limited window. Catalyst turns the `rk <= k` filter into a
    * WindowGroupLimit (PlanSpec asserts it): every task keeps only its
    * local top-k per query BEFORE the shuffle, so the exchange moves
    * O(tasks · Q · k) rows, never the O(n · Q) score matrix — the same
    * partial-before-shuffle discipline as map-side aggregation. Contrast
    * [[bruteForceTopK]], whose single global top-k is a TakeOrdered. */
  def batchedTopK(
      embeddings: DataFrame,
      queries: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(queryIdCol),
      col("qe"), sqrt(dotUnits(col("qe"), col("qe")).cast("double")).as("__qnorm"))
    val denom = sqrt(dotUnits(col(vecCol), col(vecCol)).cast("double")) * col("__qnorm")
    embeddings
      .crossJoin(broadcast(q)) // every (candidate, query) pair, one scan
      .select(col(queryIdCol), col(idCol),
        when(denom > 0, dotUnits(col(vecCol), col("qe")).cast("double") / denom)
          .otherwise(lit(null).cast("double")).as("cos_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("cos_sim").desc_nulls_last, col(idCol))))
      .filter(col("rk") <= k)
  }

  /** Sign-bucket key over `planes` hyperplane vectors (one-row DataFrame with
    * an array-of-arrays column `planes`): bit i = [dot(v, plane_i) > 0].
    * Vectors in the same bucket are ANN candidates. */
  def lshBucket(vec: Column, planes: Column): Column =
    aggregate(
      zip_with(planes, sequence(lit(0), size(planes) - 1),
        (p, i) => when(dotUnits(vec, p) > lit(java.math.BigDecimal.ZERO).cast(AccDec),
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** Deterministic spherical k-means (Lloyd) centroids for [[ivfTopK]].
    *
    * Seeds = the first `c` vectors in `idCol` order (data-derived, no RNG —
    * the whole pipeline stays reproducible). Each iteration:
    * assignment = argmax cosine against the current centroids (the SAME
    * metric [[ivfTopK]] probes with, so trained lists match probe order;
    * ties break on the smaller centroid id), update = element-wise mean of
    * the members. The per-dimension sums fold the 1e-10 unit integers in
    * DECIMAL — exact and order-independent — so centroids are bit-identical
    * under any partitioning; the mean takes one well-defined double
    * rounding per element. A centroid that loses every member keeps its
    * previous vector.
    *
    * Scale shape: each iteration is one broadcast-join scan + one
    * (cluster, dim)-grouped aggregation — map-side combinable, shuffle
    * cardinality c·d rows. Only the c·d centroid table ever reaches the
    * driver (IVF codebooks are driver-sized by construction; at 100 TB one
    * trains on a sample with the same code). Returns (centroid_id, cvec).
    */
  def kmeansCentroids(
      embeddings: DataFrame,
      c: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(c > 0 && iters >= 0, s"need c > 0, iters >= 0 (got c=$c, iters=$iters)")
    val spark = embeddings.sparkSession
    import spark.implicits._

    def toDf(cs: Seq[(Int, Seq[Double])]): DataFrame =
      cs.toDF("centroid_id", "cvec")
        .select(col("centroid_id"), col("cvec").cast("array<double>"))

    // the upstream lineage would otherwise re-execute 2·iters + 1 times
    // (seeding + assignment and per-dimension sums each iteration) —
    // materialize the two-column projection once for the whole loop
    val emb = embeddings.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Seq[(Int, Seq[Double])] =
      emb.orderBy(col(idCol)).limit(c)
        .select(col(vecCol).cast("array<double>")).collect()
        .zipWithIndex
        .map { case (r, i) => i -> r.getSeq[Double](0) }.toSeq

    for (_ <- 1 to iters) {
      val assigned = emb.crossJoin(broadcast(toDf(centroids)))
        .withColumn("__cos", cosine(col(vecCol), col("cvec")))
        .groupBy(col(idCol))
        .agg(max_by(
          struct(col(vecCol).as("v"), col("centroid_id").as("c")),
          struct(col("__cos"), (-col("centroid_id")).as("nc"))).as("__best"))
        .select(col("__best.c").as("cluster"), col("__best.v").as("v"))
      // exact per-dimension sums: c·d result rows, two-level combine
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(units(col("x"))).cast(AccDec).as("su"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
      centroids = centroids.map { case (id, prev) =>
        sums.get(id) match {
          case Some(rows) =>
            val mean = rows.sortBy(_.getInt(1)).map { r =>
              r.getDecimal(2).doubleValue / r.getLong(3) / Scale
            }.toSeq
            id -> mean
          case None => id -> prev // empty cluster: keep the old centroid
        }
      }
    }
    emb.unpersist(blocking = false) // centroids are local data by now
    toDf(centroids)
  }

  /** Per-group mean embeddings, fully IN-ENGINE (contrast with
    * [[kmeansCentroids]], which legitimately driver-collects its c·d
    * codebook): posexplode → exact DECIMAL unit sums per (group, dim) →
    * one double rounding per element → arrays reassembled with
    * sort_array(collect_list). Two map-side-combinable aggregations,
    * no driver data movement — the shape for per-language/per-source
    * corpus centroids at any cardinality. Returns (groupCol, cvec). */
  def groupCentroids(
      embeddings: DataFrame,
      groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(groupCol), col("pos"))
      .agg((sum(units(col("x"))).cast(AccDec).cast("double") / count(lit(1)) / lit(Scale))
        .as("c"))
      .groupBy(col(groupCol))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("c")))),
        p => p.getField("c")).as("cvec"))

  /** IVF (inverted-file) ANN: vectors are assigned to their nearest
    * centroid's list; a query probes only the `nprobe` nearest lists and
    * runs exact cosine within them — probe cost O(n·nprobe/C) instead of
    * O(n). Pair with [[kmeansCentroids]] for a representative codebook.
    */
  def ivfTopK(
      embeddings: DataFrame,
      queryVec: DataFrame,
      centroids: DataFrame, // (centroid_id, cvec)
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // index build: each vector → argmax-COSINE centroid — the SAME metric
    // kmeansCentroids trains with and the final ranking uses (raw dot
    // would bias assignment toward large-norm centroids, and k-means
    // means have varying norms — diffuse clusters shrink toward zero).
    // The vector's own norm is constant across its argmax, so dividing by
    // the centroid norm alone suffices. max_by aggregate, not a
    // row_number window: map-side combine reduces each partition to one
    // candidate per vector BEFORE the shuffle (the same hot-key argument
    // MergeOps.latestByKey documents); tie-break = smallest centroid_id
    // via the negated second struct field
    val cnorm = sqrt(dotUnits(col("cvec"), col("cvec")).cast("double"))
    val assigned = embeddings.crossJoin(broadcast(centroids))
      .withColumn("__csim",
        when(cnorm > 0, dotUnits(col(vecCol), col("cvec")).cast("double") / cnorm)
          .otherwise(lit(Double.NegativeInfinity)))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col(vecCol).as("v"), col("centroid_id").as("c")),
        struct(col("__csim"), (-col("centroid_id")).as("nc"))).as("__best"))
      .select(col(idCol), col("__best.v").as(vecCol), col("__best.c").as("centroid_id"))
    // probe: the query's nprobe nearest centroids, by the same metric
    val probeLists = queryVec.crossJoin(broadcast(centroids))
      .withColumn("__qsim",
        when(cnorm > 0, dotUnits(col("qe"), col("cvec")).cast("double") / cnorm)
          .otherwise(lit(Double.NegativeInfinity)))
      .orderBy(col("__qsim").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id"))
    assigned.join(broadcast(probeLists), Seq("centroid_id"))
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), cosine(col(vecCol), col("qe")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic product-quantization codebooks: the d-dim space splits
    * into `m` contiguous d/m-dim subspaces; each gets a `ksub`-entry
    * codebook trained by Lloyd iterations under EXACT fixed-point L2
    * (‖v−c‖² = vv − 2vc + cc over the 1e-10 unit integers — the argmin is
    * exact decimal arithmetic, ties break on the smaller code id, so
    * training is bit-reproducible under any partitioning). Seeds = the
    * first `ksub` vectors in `idCol` order, sliced per subspace
    * (data-derived, no RNG — same convention as [[kmeansCentroids]]).
    *
    * Scale shape: ONE scan per iteration trains every subspace at once
    * (subspaces explode to rows, assignment is a broadcast join + argmin
    * aggregate, update is a (sub, code, dim)-grouped exact sum); only the
    * m·ksub·(d/m) codebook — the same size as the input dimensionality —
    * ever reaches the driver. Returns (sub, code, cvec). */
  def pqCodebooks(
      embeddings: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && ksub > 0 && iters >= 0,
      s"need m > 0, ksub > 0, iters >= 0 (got m=$m, ksub=$ksub, iters=$iters)")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val d = embeddings.select(size(col(vecCol)).as("d")).head.getInt(0)
    require(d % m == 0, s"dimension $d not divisible into m=$m subspaces")
    val subd = d / m

    def toDf(b: Seq[(Int, Int, Seq[Double])]): DataFrame =
      b.toDF("sub", "code", "cvec")
        .select(col("sub"), col("code"), col("cvec").cast("array<double>"))

    // one materialized (id, sub, svec) projection feeds every iteration
    val subs = subVectors(embeddings, m, subd, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val seeds = embeddings.orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0))
    var books: Seq[(Int, Int, Seq[Double])] =
      for { s <- 0 until m; (v, c) <- seeds.zipWithIndex.toSeq }
        yield (s, c, v.slice(s * subd, (s + 1) * subd))

    for (_ <- 1 to iters) {
      val assigned = subs.join(broadcast(toDf(books)), Seq("sub"))
        .withColumn("__d2", l2Units(col("svec"), col("cvec")))
        .groupBy(col(idCol), col("sub"))
        .agg(min_by(struct(col("svec").as("v"), col("code").as("c")),
          struct(col("__d2"), col("code"))).as("__best"))
        .select(col("sub"), col("__best.c").as("code"), col("__best.v").as("v"))
      val sums = assigned
        .select(col("sub"), col("code"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(units(col("x"))).cast(AccDec).as("su"), count(lit(1)).as("n"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      books = books.map { case (s, c, prev) =>
        sums.get((s, c)) match {
          case Some(rows) =>
            (s, c, rows.sortBy(_.getInt(2)).map(r =>
              r.getDecimal(3).doubleValue / r.getLong(4) / Scale).toSeq)
          case None => (s, c, prev) // empty code: keep the old entry
        }
      }
    }
    subs.unpersist(blocking = false)
    toDf(books)
  }

  /** Exact fixed-point squared L2 distance in units². */
  private def l2Units(a: Column, b: Column): Column =
    dotUnits(a, a) - lit(2) * dotUnits(a, b) + dotUnits(b, b)

  /** (id, sub, svec) rows: each vector split into m contiguous subvectors. */
  private def subVectors(
      df: DataFrame, m: Int, subd: Int, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
        explode(transform(sequence(lit(0), lit(m - 1)),
          i => struct(i.as("sub"),
            slice(col(vecCol), i * lit(subd) + 1, lit(subd)).as("svec")))).as("e"))
      .select(col(idCol), col("e.sub").as("sub"), col("e.svec").as("svec"))

  /** PQ-encode every vector into its persisted ANN index row: IVF list
    * assignment plus its `m` subspace codes, ordered by subspace —
    * `(idCol, centroid_id, codes)`. Stored at ingest (m small ints per
    * vector instead of d doubles), this is the table [[adcPool]] scans at
    * query time; [[ivfPqTopK]] computes the same rows on the fly for its
    * probed candidates. Assignment and code argmin are the exact
    * fixed-point forms, so encode-at-ingest and encode-at-query are
    * bit-identical — the equivalence [[graft.ops.AnnIndex]] relies on. */
  def encodePq(
      embeddings: DataFrame,
      centroids: DataFrame,
      codebooks: DataFrame,
      m: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val books = codebooks.select(col("sub"), col("code"), col("cvec").as("bvec"))
    val subd = books.select(size(col("bvec")).as("sd")).head.getInt(0)
    val cnorm = sqrt(dotUnits(col("cvec"), col("cvec")).cast("double"))
    val assigned = embeddings.crossJoin(broadcast(centroids))
      .withColumn("__csim",
        when(cnorm > 0, dotUnits(col(vecCol), col("cvec")).cast("double") / cnorm)
          .otherwise(lit(Double.NegativeInfinity)))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col(vecCol).as("v"), col("centroid_id").as("c")),
        struct(col("__csim"), (-col("centroid_id")).as("nc"))).as("__best"))
      .select(col(idCol), col("__best.v").as(vecCol), col("__best.c").as("centroid_id"))
    assigned.select(col(idCol), col("centroid_id"))
      .join(pqCodes(assigned.select(col(idCol), col(vecCol)), books, m, subd, idCol, vecCol),
        Seq(idCol))
  }

  /** Argmin-L2 PQ codes per vector, grouped into one subspace-ordered
    * array — the `codes` column of the index row. */
  private def pqCodes(
      vectors: DataFrame, books: DataFrame, m: Int, subd: Int,
      idCol: String, vecCol: String): DataFrame =
    subVectors(vectors, m, subd, idCol, vecCol)
      .join(broadcast(books), Seq("sub"))
      .withColumn("__d2", l2Units(col("svec"), col("bvec")))
      .groupBy(col(idCol), col("sub"))
      .agg(min_by(col("code"), struct(col("__d2"), col("code"))).as("code"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** The ADC candidate pool from STORED codes alone: every index row
    * `(idCol, codes)` scores against the query's per-(sub, code) lookup
    * table — m lookup-adds per candidate — and the top `rerank` by
    * approximate cosine return. Takes NO embeddings argument: the
    * type-level statement that a persisted-index scan reads m small codes
    * per vector and nothing else (the exact re-rank joining raw vectors
    * for the pool ids happens in the caller). */
  def adcPool(
      index: DataFrame,
      queryVec: DataFrame,
      codebooks: DataFrame,
      rerank: Int,
      idCol: String = "vec_id"): DataFrame = {
    val books = codebooks.select(col("sub"), col("code"), col("cvec").as("bvec"))
    val subd = books.select(size(col("bvec")).as("sd")).head.getInt(0)
    val lut = books.crossJoin(broadcast(queryVec))
      .select(col("sub"), col("code"),
        dotUnits(slice(col("qe"), col("sub") * lit(subd) + 1, lit(subd)),
          col("bvec")).as("qd"),
        dotUnits(col("bvec"), col("bvec")).as("cc"))
    val qn2 = queryVec.select(dotUnits(col("qe"), col("qe")).as("qn2"))
    index
      .select(col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col(idCol))
      .agg(sum(col("qd")).as("adot"), sum(col("cc")).as("an2"))
      .crossJoin(broadcast(qn2))
      .select(col(idCol),
        when(col("an2") > 0 && col("qn2") > 0,
          col("adot").cast("double") /
            (sqrt(col("an2").cast("double")) * sqrt(col("qn2").cast("double"))))
          .otherwise(lit(null).cast("double")).as("approx_sim"))
      .orderBy(col("approx_sim").desc, col(idCol))
      .limit(rerank)
  }

  /** [[adcPool]] for a QUERY BATCH: `index` carries a `queryIdCol`
    * restricting each candidate row to the queries whose probe set
    * includes its list; the per-(query, sub, code) lookup table is one
    * broadcast of Q·m·ksub rows, and the pool cut is a per-query
    * rank-limited window (WindowGroupLimit: local top-`rerank` per query
    * before the shuffle). Ordering matches [[adcPool]] exactly
    * (approx desc, id — ties on the smaller id), so a batched search is
    * row-identical to Q single-query searches. */
  def adcPoolBatched(
      index: DataFrame,
      queries: DataFrame,
      codebooks: DataFrame,
      rerank: Int,
      idCol: String = "vec_id",
      queryIdCol: String = "query_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val books = codebooks.select(col("sub"), col("code"), col("cvec").as("bvec"))
    val subd = books.select(size(col("bvec")).as("sd")).head.getInt(0)
    val lut = books.crossJoin(broadcast(queries))
      .select(col(queryIdCol), col("sub"), col("code"),
        dotUnits(slice(col("qe"), col("sub") * lit(subd) + 1, lit(subd)),
          col("bvec")).as("qd"),
        dotUnits(col("bvec"), col("bvec")).as("cc"))
    val qn2 = queries.select(col(queryIdCol),
      dotUnits(col("qe"), col("qe")).as("qn2"))
    index
      .select(col(queryIdCol), col(idCol), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(lut), Seq(queryIdCol, "sub", "code"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("qd")).as("adot"), sum(col("cc")).as("an2"))
      .join(broadcast(qn2), Seq(queryIdCol))
      .select(col(queryIdCol), col(idCol),
        when(col("an2") > 0 && col("qn2") > 0,
          col("adot").cast("double") /
            (sqrt(col("an2").cast("double")) * sqrt(col("qn2").cast("double"))))
          .otherwise(lit(null).cast("double")).as("approx_sim"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(queryIdCol))
          .orderBy(col("approx_sim").desc, col(idCol))))
      .filter(col("__rk") <= rerank)
      .drop("__rk")
  }

  /** IVF+PQ compressed ANN — the billion-scale memory story next to
    * [[ivfTopK]]'s exact lists. IVF restricts the scan to the query's
    * `nprobe` lists (same codebook and metric as [[ivfTopK]], so both
    * paths probe identical lists); inside them every candidate is scored
    * from its PRODUCT-QUANTIZED code under asymmetric distance: the query
    * precomputes an m×ksub lookup table of exact unit dot products, and a
    * candidate's approximate dot is m lookup-adds over its m small codes —
    * O(m) per candidate instead of O(d), and an index that stores m codes
    * per vector instead of d doubles (the two-stage IVFADC shape of Jégou
    * et al., "Product Quantization for Nearest Neighbor Search", 2011).
    * Approximate cosine uses the code centroids' norms. The top-`rerank`
    * ADC candidates re-score EXACTLY and the pool's true top-k returns:
    * with a pool comfortably wider than k, recall is the ADC stage's
    * recall@rerank — SimilarityPqSpec measures it at 1.0 on the fixture,
    * which is what lets the sim6 row hash-match the exact oracle. */
  def ivfPqTopK(
      embeddings: DataFrame,
      queryVec: DataFrame,
      centroids: DataFrame, // (centroid_id, cvec)
      codebooks: DataFrame, // (sub, code, cvec)
      m: Int,
      k: Int,
      nprobe: Int,
      rerank: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank pool $rerank must cover k=$k")
    val books = codebooks.select(col("sub"), col("code"), col("cvec").as("bvec"))
    val subd = books.select(size(col("bvec")).as("sd")).head.getInt(0)

    // IVF side: identical assignment + probe-list selection to ivfTopK
    val cnorm = sqrt(dotUnits(col("cvec"), col("cvec")).cast("double"))
    val assigned = embeddings.crossJoin(broadcast(centroids))
      .withColumn("__csim",
        when(cnorm > 0, dotUnits(col(vecCol), col("cvec")).cast("double") / cnorm)
          .otherwise(lit(Double.NegativeInfinity)))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col(vecCol).as("v"), col("centroid_id").as("c")),
        struct(col("__csim"), (-col("centroid_id")).as("nc"))).as("__best"))
      .select(col(idCol), col("__best.v").as(vecCol), col("__best.c").as("centroid_id"))
    val probeLists = queryVec.crossJoin(broadcast(centroids))
      .withColumn("__qsim",
        when(cnorm > 0, dotUnits(col("qe"), col("cvec")).cast("double") / cnorm)
          .otherwise(lit(Double.NegativeInfinity)))
      .orderBy(col("__qsim").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id"))
    val cand = assigned.join(broadcast(probeLists), Seq("centroid_id"))
      .select(col(idCol), col(vecCol))

    // PQ encode the probed candidates on the fly ([[encodePq]]'s code
    // stage — a persisted deployment reads the same rows from
    // [[AnnIndex]]'s stored codes table instead), then the shared ADC
    // scorer: per-(sub, code) lookup table, m lookup-adds per candidate
    val coded = pqCodes(cand, books, m, subd, idCol, vecCol)
    val pool = adcPool(coded, queryVec, codebooks, rerank, idCol)

    // exact re-rank of the ADC pool only — O(rerank · d), not O(n · d)
    cand.join(broadcast(pool.select(col(idCol))), Seq(idCol))
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), cosine(col(vecCol), col("qe")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Bucketed ANN top-k: restrict the scan to the query's LSH bucket(s),
    * then exact cosine within them. Returns (vec_id, cos_sim).
    *
    * `probeRadius` is the multi-probe knob: additionally probe every
    * bucket within that hamming distance of the query's signature. With a
    * single bucket (radius 0), recall@k is capped at bucket_size/k
    * (≈ n/2^bits candidates); each radius step multiplies the candidate
    * pool (×(1+bits), then ×O(bits²)) for the SAME index — recall/cost is
    * a query-time knob, no rebuild. Probe keys are distinct and each
    * vector lives in exactly one bucket, so no candidate dedup is needed.
    * (Recall on weakly-clustered corpora is angle-theory-bounded:
    * P[bit match] = 1 − θ/π per plane — the fixture's measured values
    * live in TextSimilaritySpec.) */
  def lshTopK(
      embeddings: DataFrame,
      queryVec: DataFrame,
      planesDf: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2, "probeRadius ∈ {0,1,2}")
    val bucketed = embeddings.crossJoin(broadcast(planesDf))
      .withColumn("__bucket", lshBucket(col(vecCol), col("planes")))
    val qSig = lshBucket(col("qe"), col("planes"))
    val nb = size(col("planes"))
    def flip(sig: Column, i: Column): Column =
      sig.bitwiseXOR(call_function("shiftleft", lit(1L), i))
    val r1 = transform(sequence(lit(0), nb - 1), i => flip(qSig, i))
    // ordered i<j pairs; both sequences guarded because sequence(a, b)
    // DESCENDS when a > b — unguarded, nb=1 would make the outer run
    // [0,-1] and probe a garbage bit-63 bucket
    val r2 = when(nb >= 2,
      flatten(transform(sequence(lit(0), nb - 2), i =>
        transform(sequence(i + 1, nb - 1), j => flip(flip(qSig, i), j)))))
      .otherwise(array().cast("array<long>"))
    val probes = probeRadius match {
      case 0 => array(qSig)
      case 1 => array_union(array(qSig), r1)
      case 2 => array_union(array_union(array(qSig), r1), r2)
    }
    val qB = queryVec.crossJoin(broadcast(planesDf))
      .select(explode(probes).as("__bucket"), col("qe"))
    bucketed.join(broadcast(qB), Seq("__bucket"))
      .select(col(idCol), cosine(col(vecCol), col("qe")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}

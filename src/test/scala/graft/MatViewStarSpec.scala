package graft

import java.nio.file.Files

import graft.ops.{MatViews, MergeOps, Storage}
import graft.plans.{MatView, MatViewJoinRewrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** N-ary star views: [[MatViews.maintainStar]] rolls an aggregate over
  * fact ⋈ dim₁ ⋈ dim₂ forward from all three change feeds (the
  * generalized delta rule), and [[graft.plans.MatViewJoinRewrite]]
  * navigates matching 3-way aggregates — flat and ROLLUP — onto it.
  * The reference's richest fact resolves three dimensions in one load
  * (/root/reference/dags/dwh_fact_charer_location.py:103-115); this is
  * that shape's maintained-view counterpart. */
class MatViewStarSpec extends SparkTestBase {
  import spark.implicits._

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MatViewJoinRewrite
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq MatViewJoinRewrite)
      MatView.clear()
    }
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,6)")

  private def stamp(df: DataFrame): DataFrame = df
    .withColumn("loaded_at", lit(null).cast("timestamp"))
    .withColumn("last_upd_at", lit(null).cast("timestamp"))

  private def loadA(a: java.nio.file.Path, rows: Seq[(Long, String)]): Long =
    MergeOps.prunedConditionalUpsert(a,
      stamp(rows.toDF("a_id", "a_grp")), pk = Seq("a_id"),
      tracked = Seq("a_grp"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
      keepVersions = 8)

  private def loadB(b: java.nio.file.Path, rows: Seq[(Long, String)]): Long =
    MergeOps.prunedConditionalUpsert(b,
      stamp(rows.toDF("b_id", "b_grp")), pk = Seq("b_id"),
      tracked = Seq("b_grp"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
      keepVersions = 8)

  private def loadF(f: java.nio.file.Path,
      rows: Seq[(Long, Long, Long, BigDecimal)]): Long =
    MergeOps.prunedConditionalUpsert(f,
      stamp(rows.toDF("f_id", "f_aid", "f_bid", "f_val")
        .select(col("f_id"), col("f_aid"), col("f_bid"),
          dec(col("f_val")).as("f_val"))),
      pk = Seq("f_id"), tracked = Seq("f_aid", "f_bid", "f_val"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
      keepVersions = 8)

  private def sides(a: java.nio.file.Path, b: java.nio.file.Path,
      f: java.nio.file.Path) = Seq(
    MatViews.StarSide(f, Seq("f_id")),
    MatViews.StarSide(a, Seq("a_id")),
    MatViews.StarSide(b, Seq("b_id")))

  private val JoinKeys = Seq("f_aid" -> "a_id", "f_bid" -> "b_id")

  private def maintain(a: java.nio.file.Path, b: java.nio.file.Path,
      f: java.nio.file.Path, view: java.nio.file.Path): MatViews.MaintainStarResult =
    MatViews.maintainStar(spark, sides(a, b, f), view,
      joinKeys = JoinKeys, keys = Seq("a_grp", "b_grp"),
      sums = Map("f_val" -> "sum_val"), counts = Map("f_val" -> "cnt_val"),
      mins = Map("f_val" -> "min_val"), maxs = Map("f_val" -> "max_val"),
      keepVersions = 2)

  private def truth(a: java.nio.file.Path, b: java.nio.file.Path,
      f: java.nio.file.Path): DataFrame =
    Storage.readPartitionedVersion(spark, f)
      .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
      .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
      .groupBy("a_grp", "b_grp")
      .agg(count(lit(1)).as("count_rows"), sum("f_val").as("sum_val"),
        count(col("f_val")).as("cnt_val"),
        min("f_val").as("min_val"), max("f_val").as("max_val"))

  private def assertExact(a: java.nio.file.Path, b: java.nio.file.Path,
      f: java.nio.file.Path, view: java.nio.file.Path): Unit = {
    val got = Storage.readVersion(spark, view)
      .select("a_grp", "b_grp", "count_rows", "sum_val", "cnt_val",
        "min_val", "max_val")
      .collect().map(r => r.toSeq.map(String.valueOf)).toSet
    val want = truth(a, b, f)
      .collect().map(r => r.toSeq.map(String.valueOf)).toSet
    assert(got == want, s"star view diverged:\n got  $got\n want $want")
  }

  test("maintainStar: bootstrap, churn on each of the three sides, multi-side interval, max-holder delete") {
    val root = Files.createTempDirectory("mvstar")
    val (a, b, f, view) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"), root.resolve("view"))
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    loadF(f, (1L to 80L).map(i => (i, i % 8 + 1, i % 6 + 1, BigDecimal(i))))
    val r0 = maintain(a, b, f, view)
    assert(r0.applied.size == 3)
    assertExact(a, b, f, view)
    // dim A churn: member 3 moves a0→a9 — every fact row keyed to it
    // re-buckets (the ΔA term retracts+inserts each)
    loadA(a, Seq((3L, "a9")))
    maintain(a, b, f, view)
    assertExact(a, b, f, view)
    // fact churn: value update, insert with an ORPHAN dim-A key (joins
    // nothing, must not appear), insert, delete
    loadF(f, Seq((5L, 6L, 2L, BigDecimal(500)), (81L, 99L, 1L, BigDecimal(7)),
      (82L, 2L, 3L, BigDecimal(8))))
    MergeOps.prunedDelete(f, Seq(10L, 20L).toDF("f_id"), pk = Seq("f_id"),
      nParts = 4)
    maintain(a, b, f, view)
    assertExact(a, b, f, view)
    // BOTH dims and the fact change in ONE interval: the three delta
    // terms' old/new asymmetry must account every cross term exactly once
    loadA(a, Seq((7L, "a9")))
    loadB(b, Seq((2L, "b7")))
    loadF(f, Seq((83L, 7L, 2L, BigDecimal(11)), (1L, 1L, 2L, BigDecimal(100))))
    maintain(a, b, f, view)
    assertExact(a, b, f, view)
    // delete the row holding a group's MAX (id 5 → 500 is the global max
    // of its group): the retraction flags exactly that group for a
    // re-join recompute
    MergeOps.prunedDelete(f, Seq(5L).toDF("f_id"), pk = Seq("f_id"), nParts = 4)
    val rMax = maintain(a, b, f, view)
    assert(rMax.recomputedGroups >= 1,
      s"max-holder delete must re-join its group: $rMax")
    assertExact(a, b, f, view)
    // no-op: all three unchanged → same view version back
    assert(maintain(a, b, f, view).viewVersion ==
      maintain(a, b, f, view).viewVersion)
    Storage.deleteRecursively(root)
  }

  test("3-way aggregates — flat and ROLLUP, any join order — navigate onto the star view; guards fall back") {
    val root = Files.createTempDirectory("mvstar_rw")
    val (a, b, f, view) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"), root.resolve("view"))
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    loadF(f, (1L to 80L).map(i => (i, i % 8 + 1, i % 6 + 1, BigDecimal(i))))
    maintain(a, b, f, view)
    def register(): Unit = MatViews.registerStarRewrite(spark, "star",
      Seq(f, a, b), view, joinKeys = JoinKeys, keys = Seq("a_grp", "b_grp"),
      sums = Map("f_val" -> "sum_val"), counts = Map("f_val" -> "cnt_val"),
      mins = Map("f_val" -> "min_val"), maxs = Map("f_val" -> "max_val"))
    register()
    withRule {
      def aDf() = Storage.readPartitionedVersion(spark, a)
      def bDf() = Storage.readPartitionedVersion(spark, b)
      def fDf() = Storage.readPartitionedVersion(spark, f)
      def agg(j: DataFrame) = j.groupBy("a_grp", "b_grp")
        .agg(count(lit(1)).as("cnt"), sum("f_val").as("s"),
          min("f_val").as("mn"), max("f_val").as("mx"))
      // fact-first left-deep
      val q1 = agg(fDf().join(aDf(), col("f_aid") === col("a_id"))
        .join(bDf(), col("f_bid") === col("b_id")))
      val p1 = scanPaths(q1)
      assert(p1.exists(_.contains(view.toString)), s"expected view scan: $p1")
      assert(!p1.exists(s => s.contains(f.toString) || s.contains(a.toString) ||
        s.contains(b.toString)), s"no base may scan: $p1")
      // dim-first order and flipped equalities: same relation, same view
      val q2 = agg(bDf().join(fDf(), col("b_id") === col("f_bid"))
        .join(aDf(), col("a_id") === col("f_aid")))
      assert(scanPaths(q2).exists(_.contains(view.toString)),
        "dim-first join order must still navigate")
      MatView.clear()
      val want1 = agg(fDf().join(aDf(), col("f_aid") === col("a_id"))
        .join(bDf(), col("f_bid") === col("b_id")))
        .orderBy("a_grp", "b_grp").collect().toSeq
      assert(q1.orderBy("a_grp", "b_grp").collect().toSeq == want1)
      assert(q2.orderBy("a_grp", "b_grp").collect().toSeq == want1)
      // ROLLUP over the 3-way join keeps Expand semantics over the view
      register()
      // ROLLUP over the join through SQL — the BI-tool shape (the
      // DataFrame rollup() API false-positives Spark's self-join detector
      // on a multi-join even with no rule installed)
      aDf().createOrReplaceTempView("star_a")
      bDf().createOrReplaceTempView("star_b")
      fDf().createOrReplaceTempView("star_f")
      def roll() = spark.sql(
        """SELECT a_grp, b_grp, count(1) AS cnt, sum(f_val) AS s,
          |       max(f_val) AS mx
          |FROM star_f JOIN star_a ON f_aid = a_id
          |            JOIN star_b ON f_bid = b_id
          |GROUP BY ROLLUP(a_grp, b_grp)""".stripMargin)
      val q3 = roll()
      val p3 = scanPaths(q3)
      assert(p3.exists(_.contains(view.toString)),
        s"rollup over the star must navigate: $p3")
      val got3 = q3.collect().map(r => r.toSeq.map(String.valueOf)).toSet
      MatView.clear()
      val want3 = roll().collect().map(r => r.toSeq.map(String.valueOf)).toSet
      assert(got3 == want3, s"star rollup diverged:\n got  $got3\n want $want3")
      // guards: a 2-table subset join is a different relation; an extra
      // conjunct is too
      register()
      val subset = agg(fDf().join(aDf(), col("f_aid") === col("a_id"))
        .withColumn("b_grp", lit("x")))
      assert(!scanPaths(subset).exists(_.contains(view.toString)),
        "a 2-of-3-table join must fall back")
      val extra = agg(fDf().join(aDf(), col("f_aid") === col("a_id"))
        .join(bDf(), col("f_bid") === col("b_id") && col("b_id") =!= 3L))
      assert(!scanPaths(extra).exists(_.contains(view.toString)),
        "an extra join conjunct must fall back")
      // staleness on ANY side falls back; re-maintain resumes
      loadB(b, Seq((7L, "b7")))
      val stale = agg(fDf().join(aDf(), col("f_aid") === col("a_id"))
        .join(bDf(), col("f_bid") === col("b_id")))
      assert(!scanPaths(stale).exists(_.contains(view.toString)),
        "a lagging side must fall back")
      // compact the churned side to single-owner (the rewrite's scan
      // shape) — its state-identical marker keeps the catch-up feed
      // metadata-only — then re-maintain
      Storage.compact(spark, b)
      maintain(a, b, f, view)
      val resumed = agg(fDf().join(aDf(), col("f_aid") === col("a_id"))
        .join(bDf(), col("f_bid") === col("b_id")))
      assert(scanPaths(resumed).exists(_.contains(view.toString)),
        "re-maintained star must navigate again")
    }
    Storage.deleteRecursively(root)
  }

  test("star catalog entries round-trip: define → maintainCatalog → loadCatalog in a fresh session") {
    val root = Files.createTempDirectory("mvstar_cat")
    val (a, b, f, view) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"), root.resolve("view"))
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    loadF(f, (1L to 40L).map(i => (i, i % 8 + 1, i % 6 + 1, BigDecimal(i))))
    MatViews.defineView(root, MatViews.CatalogEntry(
      name = "star_cat", kind = "star", view = view.toString,
      keys = Seq("a_grp", "b_grp"),
      tables = Seq(f.toString, a.toString, b.toString),
      pks = Seq(Seq("f_id"), Seq("a_id"), Seq("b_id")),
      joinKeysLeft = JoinKeys.map(_._1), joinKeysRight = JoinKeys.map(_._2),
      sums = Map("f_val" -> "sum_val"), counts = Map("f_val" -> "cnt_val"),
      mins = Map("f_val" -> "min_val"), maxs = Map("f_val" -> "max_val"),
      keepVersions = 2))
    // scheduled pass bootstraps; a second pass after churn rolls forward
    val m1 = MatViews.maintainCatalog(spark, root)
    assert(m1.stars.contains("star_cat") && m1.stars("star_cat").applied.size == 3)
    loadF(f, Seq((41L, 2L, 3L, BigDecimal(9))))
    loadA(a, Seq((2L, "a9")))
    // compaction restores the single-owner composition the rewrite scans;
    // the scheduled pass advances markers through the metadata-only feeds
    Storage.compact(spark, f)
    Storage.compact(spark, a)
    MatViews.maintainCatalog(spark, root)
    assertExact(a, b, f, view)
    // a SECOND cataloged star entry carrying a KMV sketch partial: the
    // kmvs/kmvK fields must round-trip through the catalog JSON into
    // maintainCatalog (bootstrap with the partial) and loadCatalog (the
    // registered rewrite serves the estimate)
    val viewK = root.resolve("view_kmv")
    MatViews.defineView(root, MatViews.CatalogEntry(
      name = "star_kmv", kind = "star", view = viewK.toString,
      keys = Seq("a_grp"),
      tables = Seq(f.toString, a.toString, b.toString),
      pks = Seq(Seq("f_id"), Seq("a_id"), Seq("b_id")),
      joinKeysLeft = JoinKeys.map(_._1), joinKeysRight = JoinKeys.map(_._2),
      kmvs = Map("f_bid" -> "kmv_b"), kmvK = 8, keepVersions = 2))
    MatViews.maintainCatalog(spark, root)
    // fresh session: loadCatalog re-registers, the queries navigate
    MatView.clear()
    assert(MatViews.loadCatalog(spark, root) == 2)
    withRule {
      def joined = Storage.readPartitionedVersion(spark, f)
        .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
        .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
      val q = joined.groupBy("a_grp", "b_grp").agg(sum("f_val").as("s"))
      assert(scanPaths(q).exists(_.contains(view.toString)),
        "a cataloged star view must navigate after reload")
      val qk = joined.groupBy("a_grp")
        .agg(graft.plans.KmvSketch.distinctEstimate(col("f_bid"), 8).as("e"))
      assert(scanPaths(qk).exists(_.contains(viewK.toString)),
        "a cataloged KMV star view must serve the estimate after reload")
      val got = qk.orderBy("a_grp").collect().toSeq
      MatView.clear()
      val want = joined.groupBy("a_grp")
        .agg(graft.plans.KmvSketch.distinctEstimate(col("f_bid"), 8).as("e"))
        .orderBy("a_grp").collect().toSeq
      assert(got == want, s"cataloged star sketch diverged:\n got  $got\n want $want")
    }
    Storage.deleteRecursively(root)
  }

  test("median over a STAR distribution view navigates (aux keyed (group, measure) via maintainStar)") {
    val root = Files.createTempDirectory("mvstar_pct")
    val (a, b, f) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"))
    val viewP = root.resolve("view_dist")
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    // duplicate f_val values within groups so count_rows > 1 matters
    loadF(f, (1L to 80L).map(i => (i, i % 8 + 1, i % 6 + 1, BigDecimal(i % 11))))
    MatViews.maintainStar(spark, sides(a, b, f), viewP,
      joinKeys = JoinKeys, keys = Seq("a_grp", "f_val"), keepVersions = 2)
    MatViews.registerStarRewrite(spark, "star_p", Seq(f, a, b), viewP,
      joinKeys = JoinKeys, keys = Seq("a_grp", "f_val"))
    withRule {
      def joined = Storage.readPartitionedVersion(spark, f)
        .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
        .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
      def shape(j: DataFrame) = j.groupBy("a_grp")
        .agg(median(col("f_val")).as("med"),
          percentile(col("f_val"), lit(0.9)).as("p90"),
          count(lit(1)).as("cnt"))
      val q = shape(joined)
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(viewP.toString)) &&
        !paths.exists(s => s.contains(f.toString) || s.contains(a.toString) ||
          s.contains(b.toString)),
        s"median over the star must navigate onto the distribution view: $paths")
      val got = shape(joined).orderBy("a_grp").collect().toSeq
      MatView.clear()
      val want = shape(joined).orderBy("a_grp").collect().toSeq
      assert(got.toString == want.toString,
        s"star percentile diverged:\n got  $got\n want $want")
      // expression grouping rides the star path too: the analyzer pulls
      // upper(a_grp) out as a computed Project above the join, and the
      // flatten's substitution turns it back into a key expression
      MatViews.registerStarRewrite(spark, "star_p", Seq(f, a, b), viewP,
        joinKeys = JoinKeys, keys = Seq("a_grp", "f_val"))
      val eg = joined.groupBy(upper(col("a_grp")).as("g"))
        .agg(count(lit(1)).as("cnt"), median(col("f_val")).as("med"))
      assert(scanPaths(eg).exists(_.contains(viewP.toString)),
        "expression grouping over the star must navigate")
      val gotE = eg.orderBy("g").collect().toSeq
      MatView.clear()
      val wantE = joined.groupBy(upper(col("a_grp")).as("g"))
        .agg(count(lit(1)).as("cnt"), median(col("f_val")).as("med"))
        .orderBy("g").collect().toSeq
      assert(gotE == wantE, s"star expression grouping diverged:\n got  $gotE\n want $wantE")
    }
    Storage.deleteRecursively(root)
  }

  test("variance over a STAR view navigates via maintained Σx² partials; churn keeps them exact") {
    val root = Files.createTempDirectory("mvstar_var")
    val (a, b, f) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"))
    val viewV = root.resolve("view_var")
    // fact carries a DOUBLE measure (integer-valued → exact partials);
    // nulls on every 5th row make n ≠ count_rows
    def loadFd(rows: Seq[(Long, Long, Long, Option[Double])]): Long = {
      import spark.implicits._
      MergeOps.prunedConditionalUpsert(f,
        stamp(rows.toDF("f_id", "f_aid", "f_bid", "f_d")),
        pk = Seq("f_id"), tracked = Seq("f_aid", "f_bid", "f_d"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    }
    def fdRows(shift: Long => Double): Seq[(Long, Long, Long, Option[Double])] =
      (1L to 90L).map(i => (i, i % 8 + 1, i % 6 + 1,
        if (i % 5 == 0) None else Some(shift(i))))
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    loadFd(fdRows(i => ((i * 3) % 17).toDouble))
    // the cov pair spans SIDES: fact measure × dim id column — the terms
    // evaluate over joined image rows, so cross-side pairs maintain like
    // any other
    def maintainV() = MatViews.maintainStar(spark, sides(a, b, f), viewV,
      joinKeys = JoinKeys, keys = Seq("a_grp"),
      sums = Map("f_d" -> "sum_d"), counts = Map("f_d" -> "cnt_d"),
      sumsqs = Map("f_d" -> "ssq_d"),
      covs = Map("db" -> ("f_d", "b_id")), keepVersions = 2)
    maintainV()
    // churn: values shift (update pre/post images retract exactly), a
    // dim re-groups rows between a_grp values, rows delete — the signed
    // Σx² must track all three transitions
    loadFd(fdRows(i => ((i * 5) % 19).toDouble))
    loadA(a, (1L to 8L).map(i => (i, s"a${(i + 1) % 3}")))
    MergeOps.prunedDelete(f,
      { import spark.implicits._
        (1L to 90L).filter(_ % 13 == 0).toDF("f_id") },
      pk = Seq("f_id"), nParts = 4, keepVersions = 8)
    maintainV()
    // maintained Σx² must equal a from-scratch aggregate (exact — the
    // values are integer-valued doubles, so signed partials cancel
    // bit-for-bit)
    def joined = Storage.readPartitionedVersion(spark, f)
      .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
      .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
    val bothDb = col("f_d").isNotNull && col("b_id").isNotNull
    val gotP = Storage.readVersion(spark, viewV)
      .select("a_grp", "count_rows", "sum_d", "cnt_d", "ssq_d",
        "db_n", "db_sxy")
      .collect().map(r => r.toSeq.map(String.valueOf)).toSet
    val wantP = joined.groupBy("a_grp")
      .agg(count(lit(1)).as("count_rows"), sum("f_d").as("sum_d"),
        count(col("f_d")).as("cnt_d"),
        sum(col("f_d") * col("f_d")).as("ssq_d"),
        sum(when(bothDb, 1L).otherwise(0L)).as("db_n"),
        sum(when(bothDb,
          col("f_d") * col("b_id").cast("double"))).as("db_sxy"))
      .collect().map(r => r.toSeq.map(String.valueOf)).toSet
    assert(gotP == wantP, s"churned Σx² diverged:\n got  $gotP\n want $wantP")
    MatViews.registerStarRewrite(spark, "star_v", Seq(f, a, b), viewV,
      joinKeys = JoinKeys, keys = Seq("a_grp"),
      sums = Map("f_d" -> "sum_d"), counts = Map("f_d" -> "cnt_d"),
      sumsqs = Map("f_d" -> "ssq_d"), covs = Map("db" -> ("f_d", "b_id")))
    withRule {
      def shape(j: DataFrame) = j.groupBy("a_grp")
        .agg(var_samp(col("f_d")).as("vs"), stddev_pop(col("f_d")).as("sp"),
          avg(col("f_d")).as("av"),
          covar_samp(col("f_d"), col("b_id")).as("cvs"),
          count(lit(1)).as("cnt"))
      val q = shape(joined)
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(viewV.toString)) &&
        !paths.exists(s => s.contains(f.toString) || s.contains(a.toString) ||
          s.contains(b.toString)),
        s"star variance must navigate onto the Σx² partials: $paths")
      val got = q.orderBy("a_grp").collect().toSeq
      MatView.clear()
      val want = shape(joined).orderBy("a_grp").collect().toSeq
      assert(got.size == want.size && got.zip(want).forall { case (g, w) =>
        (0 until g.size).forall { j => (g.get(j), w.get(j)) match {
          case (x: Double, y: Double) => math.abs(x - y) <= 1e-9 * (1 + math.abs(y))
          case (x, y) => x == y
        } } }, s"star variance diverged:\n got  $got\n want $want")
    }
    Storage.deleteRecursively(root)
  }

  test("FILTERED star view: transition-semantics maintenance, predicate-consuming navigation, fallbacks") {
    val root = Files.createTempDirectory("mvstar_where")
    val (a, b, f, view) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"), root.resolve("view"))
    val pred = col("f_val") > 40
    def maintainW(): MatViews.MaintainStarResult =
      MatViews.maintainStar(spark, sides(a, b, f), view,
        joinKeys = JoinKeys, keys = Seq("a_grp", "b_grp"),
        sums = Map("f_val" -> "sum_val"),
        mins = Map("f_val" -> "min_val"),
        keepVersions = 2, filter = Some(pred))
    def truthW(): DataFrame =
      Storage.readPartitionedVersion(spark, f)
        .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
        .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
        .filter(pred)
        .groupBy("a_grp", "b_grp")
        .agg(count(lit(1)).as("count_rows"), sum("f_val").as("sum_val"),
          min("f_val").as("min_val"))
    def assertExactW(): Unit = {
      val got = Storage.readVersion(spark, view)
        .select("a_grp", "b_grp", "count_rows", "sum_val", "min_val")
        .collect().map(_.toSeq.map(String.valueOf)).toSet
      val want = truthW().collect().map(_.toSeq.map(String.valueOf)).toSet
      assert(got == want, s"filtered star view diverged:\n got  $got\n want $want")
    }
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    loadF(f, (1L to 80L).map(i => (i, i % 8 + 1, i % 6 + 1, BigDecimal(i))))
    maintainW()
    assertExactW()
    // crossings BOTH ways in one interval: row 40→41 enters the slice,
    // row 50→30 leaves it, row 45→44 stays; plus a dim re-point dragging
    // in-slice rows across groups, and a delete of an in-slice row
    loadF(f, Seq((40L, 1L, 1L, BigDecimal(41)), (50L, 3L, 3L, BigDecimal(30)),
      (45L, 6L, 4L, BigDecimal(44))))
    loadA(a, Seq((2L, "a9")))
    MergeOps.prunedDelete(f, Seq(77L).toDF("f_id"), pk = Seq("f_id"), nParts = 4)
    maintainW()
    assertExactW()
    // delete the slice's MIN holder (41 is now the smallest in-slice value
    // of its group): the retraction flags a re-join recompute, which must
    // re-apply the slice predicate
    MergeOps.prunedDelete(f, Seq(40L).toDF("f_id"), pk = Seq("f_id"), nParts = 4)
    val r = maintainW()
    assert(r.recomputedGroups >= 1,
      s"deleting the slice's min holder must re-join its group: $r")
    assertExactW()
    // unify owners so the scan roots match the registration, and advance
    // the marker through the empty feeds
    Storage.compact(spark, a); Storage.compact(spark, b); Storage.compact(spark, f)
    maintainW()
    assertExactW()
    // navigation: a query CARRYING the predicate navigates (conjunct
    // consumed); one missing it falls back; a TIGHTER range over the
    // measure falls back (residual not key-only)
    MatViews.registerStarRewrite(spark, "star_w", Seq(f, a, b), view,
      joinKeys = JoinKeys, keys = Seq("a_grp", "b_grp"),
      sums = Map("f_val" -> "sum_val"), mins = Map("f_val" -> "min_val"),
      where = Some(pred))
    withRule {
      def joined = Storage.readPartitionedVersion(spark, f)
        .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
        .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
      def shape(df: DataFrame) = df.filter(pred).groupBy("a_grp")
        .agg(count(lit(1)).as("cnt"), sum("f_val").as("sv"), min("f_val").as("mn"))
      val q = shape(joined)
      assert(scanPaths(q).exists(_.contains(view.toString)),
        "a star query carrying the slice predicate must navigate")
      val got = q.orderBy("a_grp").collect().toSeq
      MatView.clear()
      val want = shape(joined).orderBy("a_grp").collect().toSeq
      assert(got == want, s"filtered star rewrite diverged:\n got  $got\n want $want")
      MatViews.registerStarRewrite(spark, "star_w", Seq(f, a, b), view,
        joinKeys = JoinKeys, keys = Seq("a_grp", "b_grp"),
        sums = Map("f_val" -> "sum_val"), mins = Map("f_val" -> "min_val"),
        where = Some(pred))
      val unfiltered = joined.groupBy("a_grp").agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(unfiltered).exists(_.contains(view.toString)),
        "a star query missing the slice predicate must fall back")
      val tighter = joined.filter(col("f_val") > 60).groupBy("a_grp")
        .agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(tighter).exists(_.contains(view.toString)),
        "a tighter measure range must fall back (residual is not key-only)")
      // ROLLUP over the filtered star: predicate consumption composes
      // with the Expand-preserving rollup path (SQL form — the DataFrame
      // rollup() API false-positives Spark's self-join detector on a
      // multi-join, same as the 3-way test)
      MatViews.registerStarRewrite(spark, "star_w", Seq(f, a, b), view,
        joinKeys = JoinKeys, keys = Seq("a_grp", "b_grp"),
        sums = Map("f_val" -> "sum_val"), mins = Map("f_val" -> "min_val"),
        where = Some(pred))
      Storage.readPartitionedVersion(spark, a).createOrReplaceTempView("sw_a")
      Storage.readPartitionedVersion(spark, b).createOrReplaceTempView("sw_b")
      Storage.readPartitionedVersion(spark, f).createOrReplaceTempView("sw_f")
      def ru() = spark.sql(
        """SELECT a_grp, b_grp, count(1) AS cnt, sum(f_val) AS sv
          |FROM sw_f JOIN sw_a ON f_aid = a_id
          |          JOIN sw_b ON f_bid = b_id
          |WHERE f_val > 40
          |GROUP BY ROLLUP(a_grp, b_grp)""".stripMargin)
      val qRu = ru()
      assert(scanPaths(qRu).exists(_.contains(view.toString)),
        "a rollup carrying the slice predicate must navigate the star view")
      val gotRu = qRu.collect().map(_.toSeq.map(String.valueOf)).toSet
      MatView.clear()
      val wantRu = ru().collect().map(_.toSeq.map(String.valueOf)).toSet
      assert(gotRu == wantRu,
        s"filtered-star rollup diverged:\n got  $gotRu\n want $wantRu")
    }
    Storage.deleteRecursively(root)
  }

  test("DERIVED join keys (unknown-member): maintenance across NULL transitions, structural navigation, fallbacks") {
    import graft.ops.Facts
    val root = Files.createTempDirectory("mvstar_derive")
    val (dim, f, view) = (root.resolve("dim"), root.resolve("fact"),
      root.resolve("view"))
    def loadDim(rows: Seq[(Long, String, String)]): Long =
      MergeOps.prunedConditionalUpsert(dim,
        stamp(rows.toDF("dim_id", "d_url", "seg")), pk = Seq("dim_id"),
        tracked = Seq("d_url", "seg"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    def loadFact(rows: Seq[(Long, String, Long)]): Long =
      MergeOps.prunedConditionalUpsert(f,
        stamp(rows.toDF("f_id", "f_url", "v")), pk = Seq("f_id"),
        tracked = Seq("f_url", "v"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    val fJk = "f_jk" -> Facts.unknownMemberKey(col("f_url"))
    val dJk = "d_jk" -> Facts.unknownMemberDimKey(col("d_url"), col("dim_id"))
    val starSides = Seq(
      MatViews.StarSide(f, Seq("f_id"), derive = Seq(fJk)),
      MatViews.StarSide(dim, Seq("dim_id"), derive = Seq(dJk)))
    def maintainU(): MatViews.MaintainStarResult =
      MatViews.maintainStar(spark, starSides, view,
        joinKeys = Seq("f_jk" -> "d_jk"), keys = Seq("seg"),
        sums = Map("v" -> "sum_v"), keepVersions = 2)
    def truthU(): DataFrame =
      Facts.joinWithUnknownMember(
          Storage.readPartitionedVersion(spark, f),
          Storage.readPartitionedVersion(spark, dim),
          factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id")
        .groupBy("seg")
        .agg(count(lit(1)).as("count_rows"), sum("v").as("sum_v"))
    def assertExactU(): Unit = {
      val got = Storage.readVersion(spark, view)
        .select("seg", "count_rows", "sum_v")
        .collect().map(_.toSeq.map(String.valueOf)).toSet
      val want = truthU().collect().map(_.toSeq.map(String.valueOf)).toSet
      assert(got == want, s"derived-key view diverged:\n got  $got\n want $want")
    }
    loadDim(Seq((1L, "u1", "A"), (2L, "u2", "B"), (3L, "u3", "A"),
      (-1L, null, "UNK")))
    loadFact((1L to 30L).map(i =>
      (i, if (i % 5 == 0) null else s"u${i % 3 + 1}", i)))
    maintainU()
    assertExactU()
    // NULL transitions BOTH ways: fact 3 loses its url (moves to the
    // unknown member), fact 5 gains one (leaves it); a dim url changes
    // (facts re-key to the unknown? no — u2 still matches via dim 2's
    // NEW url? old u2 facts now orphan); plus a delete
    loadFact(Seq((3L, null.asInstanceOf[String], 300L), (5L, "u1", 50L)))
    loadDim(Seq((2L, "u2b", "B")))
    MergeOps.prunedDelete(f, Seq(10L).toDF("f_id"), pk = Seq("f_id"), nParts = 4)
    maintainU()
    assertExactU()
    Storage.compact(spark, dim); Storage.compact(spark, f)
    maintainU()
    assertExactU()
    // navigation: the engine's own unknown-member join navigates; a PLAIN
    // equi-join over the same tables (different relation) falls back
    MatViews.registerStarRewrite(spark, "star_u", Seq(f, dim), view,
      joinKeys = Seq("f_jk" -> "d_jk"), keys = Seq("seg"),
      sums = Map("v" -> "sum_v"), derives = Seq(Seq(fJk), Seq(dJk)))
    withRule {
      def shape(df: DataFrame) = df.groupBy("seg")
        .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      val q = shape(Facts.joinWithUnknownMember(
        Storage.readPartitionedVersion(spark, f),
        Storage.readPartitionedVersion(spark, dim),
        factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id"))
      assert(scanPaths(q).exists(_.contains(view.toString)),
        "the unknown-member join aggregate must navigate")
      val got = q.orderBy("seg").collect().toSeq
      MatView.clear()
      val want = shape(Facts.joinWithUnknownMember(
        Storage.readPartitionedVersion(spark, f),
        Storage.readPartitionedVersion(spark, dim),
        factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id"))
        .orderBy("seg").collect().toSeq
      assert(got == want, s"unknown-member rewrite diverged:\n got  $got\n want $want")
      MatViews.registerStarRewrite(spark, "star_u", Seq(f, dim), view,
        joinKeys = Seq("f_jk" -> "d_jk"), keys = Seq("seg"),
        sums = Map("v" -> "sum_v"), derives = Seq(Seq(fJk), Seq(dJk)))
      // a PLAIN equi-join (f_url = d_url) is a DIFFERENT relation — its
      // key ids don't match the registered derived pair → fallback
      val plain = Storage.readPartitionedVersion(spark, f)
        .join(Storage.readPartitionedVersion(spark, dim),
          col("f_url") === col("d_url"))
        .groupBy("seg").agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(plain).exists(_.contains(view.toString)),
        "a plain equi-join must not navigate onto the unknown-member view")
      // a DIFFERENT sentinel mapping (unknownId = -2) is a different
      // derived key → fallback
      val other = Storage.readPartitionedVersion(spark, f)
        .withColumn("__jk", Facts.unknownMemberKey(col("f_url")))
        .join(Storage.readPartitionedVersion(spark, dim)
          .withColumn("__jk",
            Facts.unknownMemberDimKey(col("d_url"), col("dim_id"), unknownId = -2L))
          .drop("d_url"), Seq("__jk"), "inner").drop("__jk")
        .groupBy("seg").agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(other).exists(_.contains(view.toString)),
        "a different unknown-member mapping must fall back")
    }
    Storage.deleteRecursively(root)
  }

  test("mixed edges: one unknown-member DERIVED edge + one stored equi edge in a 3-side star") {
    import spark.implicits._
    import graft.ops.Facts
    val root = Files.createTempDirectory("mvstar_mixed")
    val (dimU, dimR, f, view) = (root.resolve("dim_u"), root.resolve("dim_r"),
      root.resolve("fact"), root.resolve("view"))
    MergeOps.prunedConditionalUpsert(dimU,
      stamp(Seq((1L, "u1", "A"), (2L, "u2", "B"), (-1L, null.asInstanceOf[String], "UNK"))
        .toDF("dim_id", "d_url", "seg")),
      pk = Seq("dim_id"), tracked = Seq("d_url", "seg"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4, keepVersions = 8)
    MergeOps.prunedConditionalUpsert(dimR,
      stamp(Seq((10L, "emea"), (20L, "apac")).toDF("r_id", "r_name")),
      pk = Seq("r_id"), tracked = Seq("r_name"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4, keepVersions = 8)
    def loadFact(rows: Seq[(Long, String, Long, Long)]): Long =
      MergeOps.prunedConditionalUpsert(f,
        stamp(rows.toDF("f_id", "f_url", "f_rid", "v")), pk = Seq("f_id"),
        tracked = Seq("f_url", "f_rid", "v"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4, keepVersions = 8)
    loadFact((1L to 30L).map(i =>
      (i, if (i % 5 == 0) null else s"u${i % 2 + 1}", if (i % 3 == 0) 10L else 20L, i)))
    val fJk = "f_jk" -> Facts.unknownMemberKey(col("f_url"))
    val dJk = "d_jk" -> Facts.unknownMemberDimKey(col("d_url"), col("dim_id"))
    val starSides = Seq(
      MatViews.StarSide(f, Seq("f_id"), derive = Seq(fJk)),
      MatViews.StarSide(dimU, Seq("dim_id"), derive = Seq(dJk)),
      MatViews.StarSide(dimR, Seq("r_id")))
    val jks = Seq("f_jk" -> "d_jk", "f_rid" -> "r_id")
    def maintainM(): MatViews.MaintainStarResult =
      MatViews.maintainStar(spark, starSides, view, joinKeys = jks,
        keys = Seq("seg", "r_name"), sums = Map("v" -> "sum_v"), keepVersions = 2)
    def joined = Facts.joinWithUnknownMember(
        Storage.readPartitionedVersion(spark, f),
        Storage.readPartitionedVersion(spark, dimU),
        factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id")
      .join(Storage.readPartitionedVersion(spark, dimR),
        col("f_rid") === col("r_id"))
    def truthM(): DataFrame = joined.groupBy("seg", "r_name")
      .agg(count(lit(1)).as("count_rows"), sum("v").as("sum_v"))
    def assertExactM(): Unit = {
      val got = Storage.readVersion(spark, view)
        .select("seg", "r_name", "count_rows", "sum_v")
        .collect().map(_.toSeq.map(String.valueOf)).toSet
      val want = truthM().collect().map(_.toSeq.map(String.valueOf)).toSet
      assert(got == want, s"mixed-edge star diverged:\n got  $got\n want $want")
    }
    maintainM()
    assertExactM()
    // churn every edge class at once: a NULL transition on the derived
    // edge, a stored-key re-point, a delete
    loadFact(Seq((4L, null.asInstanceOf[String], 10L, 40L), (5L, "u1", 20L, 50L)))
    MergeOps.prunedDelete(f, Seq(9L).toDF("f_id"), pk = Seq("f_id"), nParts = 4)
    maintainM()
    assertExactM()
    Storage.compact(spark, dimU); Storage.compact(spark, dimR); Storage.compact(spark, f)
    maintainM()
    assertExactM()
    // navigation: the mixed-edge query re-plans onto the view
    MatViews.registerStarRewrite(spark, "star_m", Seq(f, dimU, dimR), view,
      joinKeys = jks, keys = Seq("seg", "r_name"), sums = Map("v" -> "sum_v"),
      derives = Seq(Seq(fJk), Seq(dJk), Seq()))
    withRule {
      val q = joined.groupBy("seg").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      assert(scanPaths(q).exists(_.contains(view.toString)),
        "a mixed derived+stored-edge star aggregate must navigate")
      val got = q.orderBy("seg").collect().toSeq
      MatView.clear()
      val want = joined.groupBy("seg").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
        .orderBy("seg").collect().toSeq
      assert(got == want, s"mixed-edge navigation diverged:\n got  $got\n want $want")
    }
    Storage.deleteRecursively(root)
  }

  test("star KMV + aux-distinct views serve the distinct panel; measure distinct stays conf-gated") {
    import graft.plans.KmvSketch
    val root = Files.createTempDirectory("mvstar_dist")
    val (a, b, f) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"))
    val viewK = root.resolve("view_kmv")
    val viewD = root.resolve("view_dist")
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    loadF(f, (1L to 80L).map(i => (i, i % 8 + 1, i % 6 + 1, BigDecimal(i))))
    def maintainK() = MatViews.maintainStar(spark, sides(a, b, f), viewK,
      joinKeys = JoinKeys, keys = Seq("a_grp"),
      kmvs = Map("f_bid" -> "kmv_b"), kmvK = 8, keepVersions = 2)
    def maintainD() = MatViews.maintainStar(spark, sides(a, b, f), viewD,
      joinKeys = JoinKeys, keys = Seq("a_grp", "f_bid"), keepVersions = 2)
    maintainK(); maintainD()
    // re-point every f_bid = 6 fact to 1: the 6-hash RETRACTS from each
    // touched group's sketch — inside the stored k-min array (k = 8,
    // unsaturated), so the conservative flag must force the re-join
    // recompute; the aux-distinct view's (grp, 6) rows cancel to zero
    loadF(f, (1L to 80L).filter(i => i % 6 + 1 == 6)
      .map(i => (i, i % 8 + 1, 1L, BigDecimal(i))))
    val rolled = maintainK()
    assert(rolled.recomputedGroups > 0,
      "a retraction inside stored sketches must flag the recompute path")
    maintainD()
    def register(): Unit = {
      MatViews.registerStarRewrite(spark, "sd", Seq(f, a, b), viewD,
        joinKeys = JoinKeys, keys = Seq("a_grp", "f_bid"))
      MatViews.registerStarRewrite(spark, "sk", Seq(f, a, b), viewK,
        joinKeys = JoinKeys, keys = Seq("a_grp"),
        kmvs = Map("f_bid" -> "kmv_b"), kmvK = 8)
    }
    register()
    withRule {
      def joined = Storage.readPartitionedVersion(spark, f)
        .join(Storage.readPartitionedVersion(spark, a), col("f_aid") === col("a_id"))
        .join(Storage.readPartitionedVersion(spark, b), col("f_bid") === col("b_id"))
      // the sketch estimate navigates onto the KMV view (k must match)
      def eShape(j: DataFrame) = j.groupBy("a_grp")
        .agg(KmvSketch.distinctEstimate(col("f_bid"), 8).as("e"))
      val qe = eShape(joined)
      val pe = scanPaths(qe)
      assert(pe.exists(_.contains(viewK.toString)) &&
        !pe.exists(s => s.contains(f.toString) || s.contains(a.toString) ||
          s.contains(b.toString)), s"sketch estimate must navigate: $pe")
      val gotE = qe.orderBy("a_grp").collect().toSeq
      // exact COUNT(DISTINCT) + COUNT(*) navigate onto the aux-distinct view
      def dShape(j: DataFrame) = j.groupBy("a_grp")
        .agg(countDistinct("f_bid").as("db"), count(lit(1)).as("cnt"))
      val qd = dShape(joined)
      assert(scanPaths(qd).exists(_.contains(viewD.toString)),
        "exact distinct must navigate onto the aux-distinct star view")
      val gotD = qd.orderBy("a_grp").collect().toSeq
      MatView.clear()
      val wantE = eShape(joined).orderBy("a_grp").collect().toSeq
      val wantD = dShape(joined).orderBy("a_grp").collect().toSeq
      assert(gotE == wantE, s"star sketch diverged:\n got  $gotE\n want $wantE")
      assert(gotD == wantD, s"star distinct diverged:\n got  $gotD\n want $wantD")
      // without the aux view, COUNT(DISTINCT measure) must NOT use the
      // sketch by default (estimate-for-exact is an explicit opt-in)...
      MatViews.registerStarRewrite(spark, "sk", Seq(f, a, b), viewK,
        joinKeys = JoinKeys, keys = Seq("a_grp"),
        kmvs = Map("f_bid" -> "kmv_b"), kmvK = 8)
      val qGated = dShape(joined)
      assert(!scanPaths(qGated).exists(_.contains(viewK.toString)),
        "COUNT(DISTINCT) must not use the star sketch without the opt-in")
      // ...and under the conf it serves the rounded estimate
      spark.conf.set(graft.plans.MatViewRewrite.ApproxDistinctKey, "true")
      try {
        val qa = joined.groupBy("a_grp").agg(countDistinct("f_bid").as("db"))
        assert(scanPaths(qa).exists(_.contains(viewK.toString)),
          "opted-in COUNT(DISTINCT) must navigate onto the star sketch")
        val gotA = qa.orderBy("a_grp").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        val wantA = wantE.map(r => (r.getString(0), math.round(r.getDouble(1))))
        assert(gotA == wantA,
          s"opt-in star approx distinct diverged:\n got  $gotA\n want $wantA")
      } finally spark.conf.unset(graft.plans.MatViewRewrite.ApproxDistinctKey)
    }
    Storage.deleteRecursively(root)
  }

  test("a LEFT OUTER join aggregate never navigates onto an inner-join star view") {
    // generic outer-join star views are deliberately unsupported — the
    // unknown-member DERIVED key (mv8 / the reference's own fact design)
    // is the supported idiom for keep-the-unmatched-facts semantics (see
    // ARCHITECTURE.md). What must hold is the guard: an outer-join
    // aggregate is a DIFFERENT relation, so it falls back to the base
    // scan — never a silently-wrong read of the inner-join view.
    val root = Files.createTempDirectory("mvstar_left")
    val (a, b, f, view) = (root.resolve("dim_a"), root.resolve("dim_b"),
      root.resolve("fact"), root.resolve("view"))
    loadA(a, (1L to 8L).map(i => (i, s"a${i % 3}")))
    loadB(b, (1L to 6L).map(i => (i, s"b${i % 2}")))
    // f_aid = 9 matches no dim member: the left join KEEPS those facts,
    // the inner-join view does not
    loadF(f, (1L to 80L).map(i => (i, i % 10 + 1, i % 6 + 1, BigDecimal(i))))
    maintain(a, b, f, view)
    MatViews.registerStarRewrite(spark, "star_l", Seq(f, a, b), view,
      joinKeys = JoinKeys, keys = Seq("a_grp", "b_grp"),
      sums = Map("f_val" -> "sum_val"), counts = Map("f_val" -> "cnt_val"),
      mins = Map("f_val" -> "min_val"), maxs = Map("f_val" -> "max_val"))
    withRule {
      def fDf() = Storage.readPartitionedVersion(spark, f)
      def aDf() = Storage.readPartitionedVersion(spark, a)
      def bDf() = Storage.readPartitionedVersion(spark, b)
      def shape(kind: String) = fDf()
        .join(aDf(), col("f_aid") === col("a_id"), kind)
        .join(bDf(), col("f_bid") === col("b_id"), kind)
        .groupBy("a_grp").agg(count(lit(1)).as("cnt"), sum("f_val").as("s"))
      val q = shape("left")
      assert(!scanPaths(q).exists(_.contains(view.toString)),
        "a LEFT JOIN aggregate must fall back to the base scan")
      val got = q.orderBy("a_grp").collect().toSeq
      MatView.clear()
      val want = shape("left").orderBy("a_grp").collect().toSeq
      assert(got == want, "the fallback must compute the outer-join answer")
      assert(got.exists(_.isNullAt(0)),
        "the fixture must actually exercise unmatched facts (null a_grp)")
    }
    Storage.deleteRecursively(root)
  }
}

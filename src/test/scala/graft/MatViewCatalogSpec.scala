package graft

import java.nio.file.Files

import graft.ops.{MatViews, MergeOps, Storage}
import graft.plans.{MatView, MatViewJoinRewrite, MatViewRewrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** The persisted view catalog (`_MATVIEWS.json`): definitions survive the
  * session — a fresh process re-registers every view with
  * [[graft.ops.MatViews.loadCatalog]] and maintains the whole set with
  * one [[graft.ops.MatViews.maintainCatalog]] call (single-base views
  * grouped onto a shared change feed, join views via the delta-join
  * rule). */
class MatViewCatalogSpec extends SparkTestBase {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  test("define → maintain → reload in a 'fresh session' → every view rewrites and stays exact") {
    import spark.implicits._
    val root = Files.createTempDirectory("mv_cat")
    val base = root.resolve("base")
    val dim = root.resolve("dim")
    val viewA = root.resolve("view_by_grp")
    val viewB = root.resolve("view_by_par")
    val viewJ = root.resolve("view_join")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,6)")
    def stamp(df: DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    def loadBase(rows: Seq[(Long, Long, BigDecimal)]) =
      MergeOps.prunedConditionalUpsert(base,
        stamp(rows.toDF("id", "fdid", "x")
          .select(col("id"), col("fdid"), dec(col("x")).as("x"))
          .withColumn("grp", concat(lit("g"), col("id") % 3))),
        pk = Seq("id"), tracked = Seq("fdid", "x", "grp"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    def loadDim(rows: Seq[(Long, String)]) =
      MergeOps.prunedConditionalUpsert(dim, stamp(rows.toDF("did", "par")),
        pk = Seq("did"), tracked = Seq("par"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    loadBase((1L to 40L).map(i => (i, i % 5 + 1, BigDecimal(i))))
    loadDim((1L to 6L).map(i => (i, s"p${i % 2}")))

    // three definitions land in ONE catalog file: two single-base views
    // (shared feed at maintenance time) and a join view
    MatViews.defineView(root, MatViews.CatalogEntry(
      name = "by_grp", kind = "single", view = viewA.toString,
      keys = Seq("grp"), base = base.toString, pk = Seq("id"),
      sums = Map("x" -> "sum_x"), mins = Map("x" -> "min_x"),
      counts = Map("x" -> "cnt_x"), keepVersions = 2))
    MatViews.defineView(root, MatViews.CatalogEntry(
      name = "by_did", kind = "single", view = viewB.toString,
      keys = Seq("fdid"), base = base.toString, pk = Seq("id"),
      sums = Map("x" -> "sum_x"), keepVersions = 2))
    MatViews.defineView(root, MatViews.CatalogEntry(
      name = "by_par", kind = "join", view = viewJ.toString,
      keys = Seq("par"), left = dim.toString, right = base.toString,
      pkLeft = Seq("did"), pkRight = Seq("id"),
      joinKeysLeft = Seq("did"), joinKeysRight = Seq("fdid"),
      sums = Map("x" -> "sum_x"), maxs = Map("x" -> "max_x"),
      keepVersions = 2))
    assert(MatViews.catalog(root).map(_.name).sorted ==
      Seq("by_did", "by_grp", "by_par"))
    // redefinition upserts, never duplicates
    MatViews.defineView(root, MatViews.catalog(root).find(_.name == "by_did").get)
    assert(MatViews.catalog(root).size == 3)

    val m1 = MatViews.maintainCatalog(spark, root) // bootstraps all three
    assert(m1.single.keySet == Set("by_grp", "by_did") &&
      m1.joins.keySet == Set("by_par"), m1.toString)

    def truthGrp() = Storage.readPartitionedVersion(spark, base)
      .groupBy("grp").agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"),
        min("x").as("min_x"), count(col("x")).as("cnt_x"))
    def truthJoin() = Storage.readPartitionedVersion(spark, dim).alias("d")
      .join(Storage.readPartitionedVersion(spark, base).alias("b"),
        col("d.did") === col("b.fdid"))
      .groupBy(col("par"))
      .agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"),
        max("x").as("max_x"))
    def assertExact(): Unit = {
      assert(Storage.readVersion(spark, viewA)
        .select("grp", "count_rows", "sum_x", "min_x", "cnt_x")
        .collect().map(_.toSeq).toSet ==
        truthGrp().collect().map(_.toSeq).toSet, "by_grp diverged")
      assert(Storage.readVersion(spark, viewJ)
        .select("par", "count_rows", "sum_x", "max_x")
        .collect().map(_.toSeq).toSet ==
        truthJoin().collect().map(_.toSeq).toSet, "by_par diverged")
    }
    assertExact()

    // "fresh session": nothing registered in-memory, then one loadCatalog
    MatView.clear()
    assert(MatViews.loadCatalog(spark, root) == 3)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations ++ Seq(MatViewRewrite, MatViewJoinRewrite)
    try {
      val qA = Storage.readPartitionedVersion(spark, base)
        .groupBy("grp").agg(count(lit(1)).as("cnt"), sum("x").as("s"))
      assert(scanPaths(qA).exists(_.contains(viewA.toString)),
        "cataloged single view must rewrite after reload")
      val qJ = Storage.readPartitionedVersion(spark, dim)
        .join(Storage.readPartitionedVersion(spark, base),
          col("did") === col("fdid"))
        .groupBy("par").agg(sum("x").as("s"), max("x").as("mx"))
      assert(scanPaths(qJ).exists(_.contains(viewJ.toString)),
        "cataloged join view must rewrite after reload")

      // churn + one catalog maintenance call: both single views roll on a
      // SHARED feed, the join view by the delta-join rule — all exact
      loadBase(Seq((3L, 2L, BigDecimal(300)), (41L, 6L, BigDecimal(7))))
      val m2 = MatViews.maintainCatalog(spark, root)
      assert(m2.single.size == 2 && m2.joins.size == 1)
      assertExact()

      // dropView removes the definition AND the in-session registration;
      // the next maintenance pass no longer touches it
      MatViews.dropView(root, "by_did")
      assert(MatViews.catalog(root).map(_.name).sorted == Seq("by_grp", "by_par"))
      val m3 = MatViews.maintainCatalog(spark, root)
      assert(m3.single.keySet == Set("by_grp") && m3.joins.keySet == Set("by_par"))
      MatViews.dropView(root, "never_existed") // missing names no-op
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(r => (r eq MatViewRewrite) || (r eq MatViewJoinRewrite))
      MatView.clear()
    }
    Storage.deleteRecursively(root)
  }

  test("workspaceCommitWithViews: base and view pins land in ONE manifest — no stale-pair window") {
    import spark.implicits._
    import graft.ops.Workspace
    val ws = Files.createTempDirectory("mv_wstx")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,6)")
    def facts(rows: Seq[(Long, BigDecimal)]): DataFrame =
      rows.toDF("id", "x").select(col("id"), dec(col("x")).as("x"))
        .withColumn("grp", concat(lit("g"), col("id") % 3))
    MatViews.defineView(ws, MatViews.CatalogEntry(
      name = "facts_by_grp", kind = "single",
      view = ws.resolve("facts_by_grp").toString,
      keys = Seq("grp"), base = ws.resolve("facts").toString,
      pk = Seq("id"), sums = Map("x" -> "sum_x"), keepVersions = 8))

    val (m0, maint0) = MatViews.workspaceCommitWithViews(spark, ws, ws,
      writes = Map("facts" -> facts((1L to 30L).map(i => (i, BigDecimal(i))))),
      keepVersions = 8)
    assert(maint0.exists(_.single.contains("facts_by_grp")))
    // ONE manifest pins BOTH the base and its view
    val pins0 = Workspace.snapshotAt(ws, m0)
    assert(pins0.keySet == Set("facts", "facts_by_grp"), pins0.toString)

    // second transaction: a full rewrite of the base (commitAll
    // semantics) — the view re-bootstraps (flat base has no feed) and
    // the NEW pair publishes atomically
    val (m1, _) = MatViews.workspaceCommitWithViews(spark, ws, ws,
      writes = Map("facts" -> facts((1L to 40L).map(i => (i, BigDecimal(i * 2))))),
      keepVersions = 8)
    assert(m1 == m0 + 1)
    def viewAsOf(m: Long): Set[Seq[Any]] = {
      val pins = Workspace.snapshotAt(ws, m)
      Workspace.readPinned(spark, ws, "facts_by_grp", pins("facts_by_grp"))
        .select("grp", "count_rows", "sum_x")
        .collect().map(_.toSeq.toIndexedSeq).toSet
    }
    def truthAsOf(m: Long): Set[Seq[Any]] = {
      val pins = Workspace.snapshotAt(ws, m)
      Workspace.readPinned(spark, ws, "facts", pins("facts"))
        .groupBy("grp").agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"))
        .collect().map(_.toSeq.toIndexedSeq).toSet
    }
    // every manifest serves a CONSISTENT (base, view) pair — the old
    // manifest still serves the old pair after the new one published
    assert(viewAsOf(m0) == truthAsOf(m0), "manifest m0 pair diverged")
    assert(viewAsOf(m1) == truthAsOf(m1), "manifest m1 pair diverged")
    assert(viewAsOf(m0) != viewAsOf(m1), "fixture must actually change the view")

    // idempotent redelivery: the twin's manifest returns, the view is
    // not re-maintained (no new view version, no new manifest)
    val vBefore = Storage.currentVersion(ws.resolve("facts_by_grp")).get
    val (m2, _) = MatViews.workspaceCommitWithViews(spark, ws, ws,
      writes = Map("facts" -> facts(Seq((1L, BigDecimal(9))))),
      keepVersions = 8, idempotencyToken = Some("tok-a"))
    val (m2again, maintAgain) = MatViews.workspaceCommitWithViews(spark, ws, ws,
      writes = Map("facts" -> facts(Seq((1L, BigDecimal(9))))),
      keepVersions = 8, idempotencyToken = Some("tok-a"))
    assert(m2again == m2 && maintAgain.isEmpty)
    assert(Storage.currentVersion(ws.resolve("facts_by_grp")).get > vBefore)
    Storage.deleteRecursively(ws)
  }

  test("star catalog entries round-trip where + derives: filtered unknown-member star from a fresh session") {
    import spark.implicits._
    import graft.ops.Facts
    val root = Files.createTempDirectory("mv_cat_star18")
    val (dim, f, view) = (root.resolve("dim"), root.resolve("fact"),
      root.resolve("view"))
    def stamp(df: DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
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
    loadDim(Seq((1L, "u1", "A"), (2L, "u2", "B"), (-1L, null, "UNK")))
    loadFact((1L to 40L).map(i =>
      (i, if (i % 5 == 0) null else s"u${i % 2 + 1}", i)))
    // the derive expressions, as the SQL strings the catalog persists —
    // the engine-side Columns (Facts.unknownMemberKey / unknownMemberDimKey)
    // must parse back to the SAME resolved expressions
    val sentinelSql = "'" + Facts.UnknownSentinel.replace("'", "''") + "'"
    MatViews.defineView(root, MatViews.CatalogEntry(
      name = "star18", kind = "star",
      view = view.toString, keys = Seq("seg"),
      tables = Seq(f.toString, dim.toString),
      pks = Seq(Seq("f_id"), Seq("dim_id")),
      joinKeysLeft = Seq("f_jk"), joinKeysRight = Seq("d_jk"),
      sums = Map("v" -> "sum_v"),
      where = "v > 10",
      derives = Seq(
        Map("f_jk" -> s"coalesce(f_url, $sentinelSql)"),
        Map("d_jk" -> s"CASE WHEN dim_id = -1 THEN $sentinelSql ELSE d_url END"))))
    // "fresh session": nothing registered, maintenance driven purely by
    // the persisted catalog
    MatView.clear()
    val m0 = MatViews.maintainCatalog(spark, root)
    assert(m0.stars.keySet == Set("star18"))
    // churn across the slice boundary and a NULL transition, re-maintain
    loadFact(Seq((3L, null.asInstanceOf[String], 9L), (5L, "u1", 50L)))
    MergeOps.prunedDelete(f, Seq(12L).toDF("f_id"), pk = Seq("f_id"), nParts = 4)
    MatViews.maintainCatalog(spark, root)
    Storage.compact(spark, dim); Storage.compact(spark, f)
    MatViews.maintainCatalog(spark, root)
    def truth(): DataFrame =
      Facts.joinWithUnknownMember(
          Storage.readPartitionedVersion(spark, f),
          Storage.readPartitionedVersion(spark, dim),
          factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id")
        .filter(col("v") > 10)
        .groupBy("seg")
        .agg(count(lit(1)).as("count_rows"), sum("v").as("sum_v"))
    val got = Storage.readVersion(spark, view)
      .select("seg", "count_rows", "sum_v")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    val want = truth().collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(got == want, s"cataloged filtered unknown-member star diverged:\n got  $got\n want $want")
    // reload registers the rewrite from the catalog alone; the engine's
    // own unknown-member join carrying the slice predicate navigates, a
    // TIGHTER key... (v is a measure, so a tighter v range must fall
    // back; the exact predicate navigates)
    assert(MatViews.loadCatalog(spark, root) >= 1)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MatViewJoinRewrite
    try {
      def shape(df: DataFrame) = df.filter(col("v") > 10).groupBy("seg")
        .agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
      val q = shape(Facts.joinWithUnknownMember(
        Storage.readPartitionedVersion(spark, f),
        Storage.readPartitionedVersion(spark, dim),
        factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id"))
      assert(scanPaths(q).exists(_.contains(view.toString)),
        "a cataloged filtered unknown-member star must navigate after reload")
      val gotQ = q.orderBy("seg").collect().toSeq
      MatView.clear()
      val wantQ = shape(Facts.joinWithUnknownMember(
        Storage.readPartitionedVersion(spark, f),
        Storage.readPartitionedVersion(spark, dim),
        factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id"))
        .orderBy("seg").collect().toSeq
      assert(gotQ == wantQ, s"navigated result diverged:\n got  $gotQ\n want $wantQ")
      // a tighter MEASURE range implies the slice but cannot re-apply
      // over partials → falls back
      MatViews.loadCatalog(spark, root)
      val tighter = Facts.joinWithUnknownMember(
          Storage.readPartitionedVersion(spark, f),
          Storage.readPartitionedVersion(spark, dim),
          factKey = "f_url", dimNaturalKey = "d_url", dimId = "dim_id")
        .filter(col("v") > 30).groupBy("seg").agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(tighter).exists(_.contains(view.toString)),
        "a tighter measure range must fall back")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq MatViewJoinRewrite)
      MatView.clear()
    }
    Storage.deleteRecursively(root)
  }

  test("workspaceCommitWithViews coherence: a view whose base was NOT written this txn is maintained but not pinned") {
    import spark.implicits._
    import graft.ops.Workspace
    val ws = Files.createTempDirectory("mv_wstx_coh")
    def facts(rows: Seq[(Long, BigDecimal)], grpMod: Long = 3L): DataFrame =
      rows.toDF("id", "x")
        .select(col("id"), col("x").cast("decimal(38,6)").as("x"))
        .withColumn("grp", concat(lit("g"), col("id") % grpMod))
    for (t <- Seq("facts_a", "facts_b"))
      MatViews.defineView(ws, MatViews.CatalogEntry(
        name = s"${t}_by_grp", kind = "single",
        view = ws.resolve(s"${t}_by_grp").toString,
        keys = Seq("grp"), base = ws.resolve(t).toString,
        pk = Seq("id"), sums = Map("x" -> "sum_x"), keepVersions = 8))
    // txn 1 writes BOTH bases: both views pin
    val (m0, _) = MatViews.workspaceCommitWithViews(spark, ws, ws,
      writes = Map(
        "facts_a" -> facts((1L to 20L).map(i => (i, BigDecimal(i)))),
        "facts_b" -> facts((1L to 10L).map(i => (i, BigDecimal(i * 3))))),
      keepVersions = 8)
    assert(Workspace.snapshotAt(ws, m0).keySet ==
      Set("facts_a", "facts_b", "facts_a_by_grp", "facts_b_by_grp"))
    // txn 2 writes ONLY facts_a: facts_b's view still maintains (its
    // base is unchanged, so its state is still correct) but its pin must
    // come from the PREVIOUS manifest, never from this transaction —
    // the coherence rule pins only views of bases written here
    val (m1, maint1) = MatViews.workspaceCommitWithViews(spark, ws, ws,
      writes = Map("facts_a" -> facts((1L to 25L).map(i => (i, BigDecimal(i * 2))))),
      keepVersions = 8)
    assert(maint1.exists(_.single.keySet ==
      Set("facts_a_by_grp", "facts_b_by_grp")))
    val pins0 = Workspace.snapshotAt(ws, m0)
    val pins1 = Workspace.snapshotAt(ws, m1)
    assert(pins1("facts_a_by_grp") > pins0("facts_a_by_grp"),
      "the written base's view must re-pin at its new version")
    assert(pins1("facts_b_by_grp") == pins0("facts_b_by_grp"),
      "the unwritten base's view must carry its previous pin forward")
    // both manifests still serve coherent pairs
    def pairOk(m: Long, t: String): Unit = {
      val pins = Workspace.snapshotAt(ws, m)
      val got = Workspace.readPinned(spark, ws, s"${t}_by_grp", pins(s"${t}_by_grp"))
        .select("grp", "count_rows", "sum_x")
        .collect().map(_.toSeq.toIndexedSeq).toSet
      val want = Workspace.readPinned(spark, ws, t, pins(t))
        .groupBy("grp").agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"))
        .collect().map(_.toSeq.toIndexedSeq).toSet
      assert(got == want, s"manifest w$m pair for $t diverged")
    }
    pairOk(m0, "facts_a"); pairOk(m0, "facts_b")
    pairOk(m1, "facts_a"); pairOk(m1, "facts_b")
    Storage.deleteRecursively(ws)
  }

  test("statistical-family partials round-trip the catalog: power sums + cov pair from a fresh session") {
    import spark.implicits._
    val root = Files.createTempDirectory("mv_cat_stats")
    val base = root.resolve("base")
    val view = root.resolve("view_stats")
    def stamp(df: DataFrame) = df
      .withColumn("loaded_at", lit(null).cast("timestamp"))
      .withColumn("last_upd_at", lit(null).cast("timestamp"))
    def load(rows: Seq[(Long, String, Option[Double], Option[Double])]) =
      MergeOps.prunedConditionalUpsert(base,
        stamp(rows.toDF("id", "grp", "x", "y")),
        pk = Seq("id"), tracked = Seq("grp", "x", "y"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    load((1L to 60L).map(i => (i, s"g${i % 2}",
      if (i % 5 == 0) None else Some(((i * 3) % 11).toDouble),
      if (i % 4 == 0) None else Some(((i * 3) % 11 + i % 3).toDouble))))
    // the full stat definition persists: sums/counts, power sums through
    // Σx⁴, and the cov pair — one catalog entry
    MatViews.defineView(root, MatViews.CatalogEntry(
      name = "stats_by_grp", kind = "single",
      view = view.toString, keys = Seq("grp"),
      base = base.toString, pk = Seq("id"),
      sums = Map("x" -> "sum_x"), counts = Map("x" -> "cnt_x"),
      sumsqs = Map("x" -> "ssq_x"), sumcubes = Map("x" -> "scu_x"),
      sumquads = Map("x" -> "squ_x"),
      covs = Map("xy" -> Seq("x", "y")), keepVersions = 2))
    MatViews.maintainCatalog(spark, root)
    // churn + roll forward through the SAME catalog path
    load(Seq((3L, "g1", Some(25.0), Some(26.0)), (61L, "g0", Some(4.0), None)))
    MatViews.maintainCatalog(spark, root)
    Storage.compact(spark, base)
    MatViews.maintainCatalog(spark, root)
    // "fresh session": clear every in-memory registration, reload from disk
    MatView.clear()
    assert(MatViews.loadCatalog(spark, root) == 1)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MatViewRewrite
    try {
      def shape(df: DataFrame) = df.groupBy("grp").agg(
        var_samp(col("x")).as("vx"), skewness(col("x")).as("sk"),
        kurtosis(col("x")).as("ku"), corr(col("x"), col("y")).as("r"),
        expr("regr_slope(y, x)").as("sl"), count(lit(1)).as("cnt"))
      val q = shape(Storage.readPartitionedVersion(spark, base))
      assert(scanPaths(q).exists(_.contains(view.toString)) &&
        !scanPaths(q).exists(_.contains(base.toString)),
        "the reloaded stat view must serve the whole family")
      val got = q.orderBy("grp").collect().toSeq
      MatView.clear()
      val want = shape(Storage.readPartitionedVersion(spark, base))
        .orderBy("grp").collect().toSeq
      assert(got.size == want.size && got.zip(want).forall { case (g, w) =>
        (0 until g.size).forall { j => (g.get(j), w.get(j)) match {
          case (p: Double, v: Double) =>
            (p.isNaN && v.isNaN) || math.abs(p - v) <= 1e-9 * (1 + math.abs(v))
          case (p, v) => p == v
        } } }, s"reloaded stat family diverged:\n got  $got\n want $want")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq MatViewRewrite)
      MatView.clear()
    }
    Storage.deleteRecursively(root)
  }
}

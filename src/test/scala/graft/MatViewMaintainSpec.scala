package graft

import java.nio.file.Files

import graft.ops.{MatViews, MergeOps, Storage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.ops.MatViews.maintain]] — one-call incremental view
  * maintenance with retractable min/max: counts/sums roll forward as
  * signed partials; extremes recompute ONLY when a retraction
  * ties-or-beats the stored value. Every step is oracle-checked against
  * a full recompute of the base. */
class MatViewMaintainSpec extends SparkTestBase {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,6)")

  /** ids 1..n → (id, g{id%3}, x) rows shaped for the pruned upsert. */
  private def rows(ids: Seq[Int], x: Int => BigDecimal): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"g${i % 3}", x(i))).toDF("id", "grp", "x")
      .select(col("id"), col("grp"), dec(col("x")).as("x"),
        lit(null).cast("timestamp").as("loaded_at"),
        lit(null).cast("timestamp").as("last_upd_at"))
  }

  private def load(base: java.nio.file.Path, df: DataFrame): Long =
    MergeOps.prunedConditionalUpsert(base, df, pk = Seq("id"),
      tracked = Seq("grp", "x"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
      keepVersions = 8)

  private def maintain(base: java.nio.file.Path, view: java.nio.file.Path,
      maxCollected: Int = 10000): MatViews.MaintainResult =
    MatViews.maintain(spark, base, view, pk = Seq("id"), keys = Seq("grp"),
      sums = Map("x" -> "sum_x"), mins = Map("x" -> "min_x"),
      maxs = Map("x" -> "max_x"), counts = Map("x" -> "cnt_x"),
      keepVersions = 2, maxCollectedGroups = maxCollected)

  /** The view's committed state must equal a full recompute of the base. */
  private def assertExact(base: java.nio.file.Path,
      view: java.nio.file.Path): Unit = {
    val got = Storage.readVersion(spark, view)
      .select("grp", "count_rows", "sum_x", "min_x", "max_x", "cnt_x")
    val want = Storage.readPartitionedVersion(spark, base)
      .groupBy("grp")
      .agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"),
        min("x").as("min_x"), max("x").as("max_x"), count("x").as("cnt_x"))
    val g = got.collect().map(_.toSeq).toSet
    val w = want.collect().map(_.toSeq).toSet
    assert(g == w, s"maintained state diverged:\n got  $g\n want $w")
  }

  test("bootstrap, additive advance, extreme-hit recompute, group death — each exact") {
    val root = Files.createTempDirectory("mvm")
    val base = root.resolve("base")
    val view = root.resolve("view")
    // g0 = ids 3,6,..,60 (min x 3, max 60); g1 = 1,4,..,58; g2 = 2,5,..,59
    load(base, rows(1 to 60, i => BigDecimal(i)))
    val r0 = maintain(base, view)
    assert(r0.recomputedGroups == 0)
    assert(MatViews.appliedBase(view).contains(r0.appliedBase))
    assertExact(base, view)

    // already at the base's version: a second call is a pure no-op
    val r0b = maintain(base, view)
    assert(r0b.viewVersion == r0.viewVersion)

    // interior update (30 stays strictly inside g0's [3, 60]) + brand-new
    // ids: the additive fast path — zero groups recomputed
    load(base, rows(Seq(30), _ => BigDecimal(45)) // retracts 30, inserts 45
      .unionByName(rows(61 to 66, i => BigDecimal(i))))
    val r1 = maintain(base, view)
    assert(r1.recomputedGroups == 0, s"interior update must not recompute: $r1")
    assertExact(base, view)

    // update the row HOLDING g0's min (x 3 → 12): the retraction ties the
    // stored min, so exactly that group recomputes
    load(base, rows(Seq(3), _ => BigDecimal(12)))
    val r2 = maintain(base, view)
    assert(r2.recomputedGroups == 1, s"min-hit must recompute its group: $r2")
    assertExact(base, view)

    // delete the row holding g0's max (id 66, x 66) → max-side recompute
    import spark.implicits._
    MergeOps.prunedDelete(base, Seq(66L).toDF("id"), pk = Seq("id"), nParts = 4)
    val r3 = maintain(base, view)
    assert(r3.recomputedGroups == 1, s"max-hit must recompute its group: $r3")
    assertExact(base, view)

    // delete EVERY g1 row: the group must disappear from the state (a
    // fully-retracted key is dropped, not recomputed)
    val g1 = (1 to 66).filter(_ % 3 == 1)
    MergeOps.prunedDelete(base, g1.map(_.toLong).toDF("id"), pk = Seq("id"),
      nParts = 4)
    maintain(base, view)
    assertExact(base, view)
    assert(!Storage.readVersion(spark, view).collect().map(_.getString(0))
      .contains("g1"))
    Storage.deleteRecursively(root)
  }

  test("lowering the min-holder is exempt: the inserted value ties-or-beats the retraction") {
    val root = Files.createTempDirectory("mvm_low")
    val base = root.resolve("base")
    val view = root.resolve("view")
    load(base, rows(1 to 30, i => BigDecimal(i)))
    maintain(base, view)
    // id 3 holds g0's min (x=3); lowering it retracts 3 and inserts 1 —
    // ins ≤ ret proves min(after) = min(stored, ins), no recompute
    load(base, rows(Seq(3), _ => BigDecimal(1)))
    val r = maintain(base, view)
    assert(r.recomputedGroups == 0, s"lowering the min must merge exactly: $r")
    assertExact(base, view)
    // raising the MAX-holder symmetrically (id 30 holds g0's max)
    load(base, rows(Seq(30), _ => BigDecimal(99)))
    val r2 = maintain(base, view)
    assert(r2.recomputedGroups == 0, s"raising the max must merge exactly: $r2")
    assertExact(base, view)
    Storage.deleteRecursively(root)
  }

  test("maintainAll: one shared feed, unrelated-column churn never recomputes the other view") {
    import spark.implicits._
    val root = Files.createTempDirectory("mvm_all")
    val base = root.resolve("base")
    val viewA = root.resolve("viewA")
    val viewB = root.resolve("viewB")
    def wide(ids: Seq[Int], x: Int => BigDecimal, y: Int => BigDecimal): DataFrame =
      ids.map(i => (i.toLong, s"g${i % 3}", x(i), s"h${i % 2}", y(i)))
        .toDF("id", "grp", "x", "grp2", "y")
        .select(col("id"), col("grp"), dec(col("x")).as("x"),
          col("grp2"), dec(col("y")).as("y"),
          lit(null).cast("timestamp").as("loaded_at"),
          lit(null).cast("timestamp").as("last_upd_at"))
    def loadW(df: DataFrame): Long = MergeOps.prunedConditionalUpsert(base, df,
      pk = Seq("id"), tracked = Seq("grp", "x", "grp2", "y"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
      keepVersions = 8)
    val specs = Seq(
      MatViews.ViewSpec(viewA, keys = Seq("grp"),
        sums = Map("x" -> "sum_x"), mins = Map("x" -> "min_x"),
        maxs = Map("x" -> "max_x"), counts = Map("x" -> "cnt_x"),
        keepVersions = 2),
      MatViews.ViewSpec(viewB, keys = Seq("grp2"),
        sums = Map("y" -> "sum_y"), keepVersions = 2))
    def assertBoth(): Unit = {
      val baseDf = Storage.readPartitionedVersion(spark, base)
      val wantA = baseDf.groupBy("grp")
        .agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"),
          min("x").as("min_x"), max("x").as("max_x"), count("x").as("cnt_x"))
        .collect().map(_.toSeq).toSet
      val gotA = Storage.readVersion(spark, viewA)
        .select("grp", "count_rows", "sum_x", "min_x", "max_x", "cnt_x")
        .collect().map(_.toSeq).toSet
      assert(gotA == wantA, s"viewA diverged:\n got  $gotA\n want $wantA")
      val wantB = baseDf.groupBy("grp2")
        .agg(count(lit(1)).as("count_rows"), sum("y").as("sum_y"))
        .collect().map(_.toSeq).toSet
      val gotB = Storage.readVersion(spark, viewB)
        .select("grp2", "count_rows", "sum_y")
        .collect().map(_.toSeq).toSet
      assert(gotB == wantB, s"viewB diverged:\n got  $gotB\n want $wantB")
    }
    loadW(wide(1 to 60, i => BigDecimal(i), i => BigDecimal(i * 2)))
    val boot = MatViews.maintainAll(spark, base, Seq("id"), specs)
    assert(boot.forall(_.recomputedGroups == 0))
    assertBoth()
    // churn ONLY y on the row holding g0's min x: the shared feed emits
    // the pre/post pair for BOTH views' columns, but view A's x values
    // are identical across the pair — counts/sums cancel, min/max take
    // the ins-ties-ret exemption, zero recomputes
    loadW(wide(Seq(3), _ => BigDecimal(3), _ => BigDecimal(777)))
    val r = MatViews.maintainAll(spark, base, Seq("id"), specs)
    assert(r.forall(_.recomputedGroups == 0),
      s"unrelated churn must not recompute: $r")
    assert(r.forall(_.appliedBase == Storage.currentVersion(base).get))
    assertBoth()
    // stagger the lags: advance the base twice maintaining ONLY viewB in
    // between, then a joint call rolls A over two versions and B over one
    // — two distinct from-versions, each with its own feed
    loadW(wide(Seq(61), _ => BigDecimal(0), _ => BigDecimal(5)))
    MatViews.maintainAll(spark, base, Seq("id"), specs.filter(_.view == viewB))
    loadW(wide(Seq(62), _ => BigDecimal(100), _ => BigDecimal(6)))
    val r2 = MatViews.maintainAll(spark, base, Seq("id"), specs)
    assert(r2.forall(_.appliedBase == Storage.currentVersion(base).get))
    assertBoth()
    Storage.deleteRecursively(root)
  }

  test("forced full-scan fallback (maxCollectedGroups=0) recomputes exactly") {
    val root = Files.createTempDirectory("mvm_fb")
    val base = root.resolve("base")
    val view = root.resolve("view")
    load(base, rows(1 to 30, i => BigDecimal(i)))
    maintain(base, view)
    // delete g0's min row; the flagged-key set (1 group) exceeds the
    // forced-zero collection budget → one full re-aggregate, same answer
    import spark.implicits._
    MergeOps.prunedDelete(base, Seq(3L).toDF("id"), pk = Seq("id"), nParts = 4)
    val r = maintain(base, view, maxCollected = 0)
    assert(r.recomputedGroups == 1)
    assertExact(base, view)
    Storage.deleteRecursively(root)
  }

  test("null-valued rows never trigger a recompute (nulls are never the extreme)") {
    val root = Files.createTempDirectory("mvm_null")
    val base = root.resolve("base")
    val view = root.resolve("view")
    // id 63 lands in g0 with a NULL x
    load(base, rows(1 to 12, i => BigDecimal(i))
      .unionByName(rows(Seq(63), _ => BigDecimal(0))
        .withColumn("x", lit(null).cast("decimal(38,6)"))))
    maintain(base, view)
    assertExact(base, view)
    // an INCREMENTAL null-valued insert bumps the count but must pass the
    // stored sum/min/max through untouched (its sum partial is null)
    load(base, rows(Seq(66), _ => BigDecimal(0))
      .withColumn("x", lit(null).cast("decimal(38,6)")))
    val ri = maintain(base, view)
    assert(ri.recomputedGroups == 0, s"null insert must not recompute: $ri")
    assertExact(base, view)
    // deleting the null-x rows drops counts but cannot move min/max
    import spark.implicits._
    MergeOps.prunedDelete(base, Seq(63L, 66L).toDF("id"), pk = Seq("id"),
      nParts = 4)
    val r = maintain(base, view)
    assert(r.recomputedGroups == 0, s"null retraction must not recompute: $r")
    assertExact(base, view)
    Storage.deleteRecursively(root)
  }

  test("FILTERED view maintenance: boundary crossings feed as one-sided rows; recompute scans the filtered base") {
    import spark.implicits._
    val root = Files.createTempDirectory("mvm_where")
    val base = root.resolve("base")
    val view = root.resolve("view")
    val pred = col("x") > lit(BigDecimal(30)).cast("decimal(38,6)")
    def maintainF(): MatViews.MaintainResult =
      MatViews.maintain(spark, base, view, pk = Seq("id"), keys = Seq("grp"),
        sums = Map("x" -> "sum_x"), mins = Map("x" -> "min_x"),
        maxs = Map("x" -> "max_x"), keepVersions = 2, filter = Some(pred))
    def assertFilteredExact(): Unit = {
      val got = Storage.readVersion(spark, view)
        .select("grp", "count_rows", "sum_x", "min_x", "max_x")
        .collect().map(_.toSeq).toSet
      val want = Storage.readPartitionedVersion(spark, base).filter(pred)
        .groupBy("grp")
        .agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"),
          min("x").as("min_x"), max("x").as("max_x"))
        .collect().map(_.toSeq).toSet
      assert(got == want, s"filtered view diverged:\n got  $got\n want $want")
    }
    load(base, rows(1 to 60, i => BigDecimal(i)))
    maintainF() // bootstrap aggregates ONLY x > 30
    assertFilteredExact()
    // crossings in one interval: id 10 ENTERS (10→100), id 40 LEAVES
    // (40→5), id 50 moves within (50→45); an outside-only change (5→7)
    // must not touch the view at all
    load(base, rows(Seq(10), _ => BigDecimal(100)) unionByName
      rows(Seq(40), _ => BigDecimal(5)) unionByName
      rows(Seq(50), _ => BigDecimal(45)) unionByName
      rows(Seq(5), _ => BigDecimal(7)))
    maintainF()
    assertFilteredExact()
    // delete the filtered MAX holder: the recompute scan must apply the
    // filter, or the recomputed extreme would re-admit excluded rows
    val maxHolder = Storage.readPartitionedVersion(spark, base).filter(pred)
      .orderBy(col("x").desc).select(col("id")).as[Long].head()
    MergeOps.prunedDelete(base, Seq(maxHolder).toDF("id"), pk = Seq("id"),
      nParts = 4)
    val r = maintainF()
    assert(r.recomputedGroups >= 1, s"filtered max delete must recompute: $r")
    assertFilteredExact()
    Storage.deleteRecursively(root)
  }

  test("KMV sketch partials: inserts merge, sketch-hit deletes recompute, misses don't") {
    import graft.plans.KmvSketch
    import spark.implicits._
    val root = Files.createTempDirectory("mvm_kmv")
    val base = root.resolve("base")
    val view = root.resolve("view")
    val K = 4 // small k: sketches saturate, so some hashes stay OUTSIDE
    // uid carries the distinct-count signal: uid = id * 7 (all distinct)
    def uidRows(ids: Seq[Int]): DataFrame =
      ids.map(i => (i.toLong, s"g${i % 2}", (i * 7).toLong))
        .toDF("id", "grp", "uid")
        .select(col("id"), col("grp"), col("uid"),
          lit(null).cast("timestamp").as("loaded_at"),
          lit(null).cast("timestamp").as("last_upd_at"))
    def loadU(ids: Seq[Int]): Long =
      MergeOps.prunedConditionalUpsert(base, uidRows(ids), pk = Seq("id"),
        tracked = Seq("grp", "uid"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    def maintainK(): MatViews.MaintainResult =
      MatViews.maintain(spark, base, view, pk = Seq("id"), keys = Seq("grp"),
        kmvs = Map("uid" -> "kmv_uid"), kmvK = K, keepVersions = 2)
    // the view's sketch must be BIT-IDENTICAL to one built from the base
    def assertSketchExact(): Unit = {
      val got = Storage.readVersion(spark, view)
        .select(col("grp"), col("kmv_uid"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val want = Storage.readPartitionedVersion(spark, base)
        .groupBy("grp").agg(KmvSketch.partialCol(col("uid"), K).as("kmv_uid"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got == want, s"sketch diverged:\n got  $got\n want $want")
    }
    loadU(1 to 40)
    maintainK()
    assertSketchExact()
    // insert-only advance: hashes merge into the k-min set, no recompute
    loadU(41 to 50)
    val rIns = maintainK()
    assert(rIns.recomputedGroups == 0, s"insert-only must merge: $rIns")
    assertSketchExact()
    // delete a row whose hash is OUTSIDE the stored sketch (> k-th min):
    // the sketch cannot be affected, no recompute
    val byGroup = (1 to 50).groupBy(i => s"g${i % 2}")
    val sketchHashes = byGroup.map { case (g, ids) =>
      g -> ids.map(i => KmvSketch.hash(i * 7L)).sorted.take(K).toSet
    }
    val outside = (1 to 50).find(i =>
      !sketchHashes(s"g${i % 2}").contains(KmvSketch.hash(i * 7L))).get
    MergeOps.prunedDelete(base, Seq(outside.toLong).toDF("id"),
      pk = Seq("id"), nParts = 4)
    val rMiss = maintainK()
    assert(rMiss.recomputedGroups == 0,
      s"delete outside the sketch must not recompute: $rMiss")
    assertSketchExact()
    // delete a row whose hash IS in the sketch: flagged, recomputed, exact
    val inside = (1 to 50).find(i => i != outside &&
      sketchHashes(s"g${i % 2}").contains(KmvSketch.hash(i * 7L))).get
    MergeOps.prunedDelete(base, Seq(inside.toLong).toDF("id"),
      pk = Seq("id"), nParts = 4)
    val rHit = maintainK()
    assert(rHit.recomputedGroups >= 1,
      s"delete inside the sketch must recompute its group: $rHit")
    assertSketchExact()
    // the re-aggregated ESTIMATE matches running the sketch on the base
    val est = Storage.readVersion(spark, view)
      .groupBy().agg(KmvSketch.mergeCol(col("kmv_uid"), K).as("e"))
      .collect().head.getDouble(0)
    val want = Storage.readPartitionedVersion(spark, base)
      .agg(KmvSketch.distinctEstimate(col("uid"), K).as("e"))
      .collect().head.getDouble(0)
    assert(est == want, s"merged estimate $est != direct $want")
    Storage.deleteRecursively(root)
  }

  test("FILTERED view with a STRING-keyed KMV partial: crossings and retractions stay exact") {
    import graft.plans.KmvSketch
    import spark.implicits._
    val root = Files.createTempDirectory("mvm_kmv_where")
    val base = root.resolve("base")
    val view = root.resolve("view")
    val K = 4
    val pred = col("score") > 10
    def rows(data: Seq[(Long, String, String, Long)]): DataFrame =
      data.toDF("id", "grp", "name", "score")
        .select(col("id"), col("grp"), col("name"), col("score"),
          lit(null).cast("timestamp").as("loaded_at"),
          lit(null).cast("timestamp").as("last_upd_at"))
    def load(data: Seq[(Long, String, String, Long)]): Long =
      MergeOps.prunedConditionalUpsert(base, rows(data), pk = Seq("id"),
        tracked = Seq("grp", "name", "score"),
        runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
        keepVersions = 8)
    def maintainW(): MatViews.MaintainResult =
      MatViews.maintain(spark, base, view, pk = Seq("id"), keys = Seq("grp"),
        kmvs = Map("name" -> "kmv_names"), kmvK = K, keepVersions = 2,
        filter = Some(pred))
    // the view's sketch must be BIT-IDENTICAL to one built from the
    // FILTERED base
    def assertExactW(): Unit = {
      val got = Storage.readVersion(spark, view)
        .select(col("grp"), col("kmv_names"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val want = Storage.readPartitionedVersion(spark, base).filter(pred)
        .groupBy("grp").agg(KmvSketch.partialCol(col("name"), K).as("kmv_names"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(got == want, s"filtered string sketch diverged:\n got  $got\n want $want")
    }
    val init = (1L to 40L).map(i =>
      (i, s"g${i % 2}", s"user-$i", if (i % 4 == 0) 5L else 20L))
    load(init)
    maintainW()
    assertExactW()
    // crossings both ways: id 4 (below) rises into the slice, id 2
    // (inside) drops out — its name's hash may sit inside the stored
    // sketch, forcing the recompute path over the FILTERED base; plus a
    // rename inside the slice (retract old hash, insert new)
    load(Seq((4L, "g0", "user-4", 30L), (2L, "g0", "user-2", 3L),
      (7L, "g1", "user-7b", 25L)))
    maintainW()
    assertExactW()
    // delete an in-slice member outright
    MergeOps.prunedDelete(base, Seq(3L).toDF("id"), pk = Seq("id"), nParts = 4)
    maintainW()
    assertExactW()
    Storage.deleteRecursively(root)
  }
}

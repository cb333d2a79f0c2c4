package graft

import java.nio.file.Files

import graft.ops.{MatViews, MergeOps, Storage}
import graft.plans.{MatView, MatViewJoinRewrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Aggregate navigation over maintained JOIN views:
  * [[graft.ops.MatViews.maintainJoin]] rolls the view forward from both
  * bases' change feeds by the delta-join rule, and
  * [[graft.plans.MatViewJoinRewrite]] re-plans matching
  * Aggregate(Join(A,B)) queries onto it — every guard failing toward the
  * base join. */
class MatViewJoinSpec extends SparkTestBase {

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

  /** dim(d_id pk, d_grp) and fact(f_id pk, f_did → d_id, f_val) as
    * partition-manifested upsert tables. */
  private def fixture(): (java.nio.file.Path, java.nio.file.Path, java.nio.file.Path) = {
    val root = Files.createTempDirectory("mvj")
    (root.resolve("dim"), root.resolve("fact"), root.resolve("view"))
  }

  private def loadDim(dim: java.nio.file.Path, rows: Seq[(Long, String)]): Long = {
    import spark.implicits._
    MergeOps.prunedConditionalUpsert(dim,
      rows.toDF("d_id", "d_grp")
        .withColumn("loaded_at", lit(null).cast("timestamp"))
        .withColumn("last_upd_at", lit(null).cast("timestamp")),
      pk = Seq("d_id"), tracked = Seq("d_grp"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
      keepVersions = 8)
  }

  private def loadFact(fact: java.nio.file.Path,
      rows: Seq[(Long, Long, BigDecimal)]): Long = {
    import spark.implicits._
    MergeOps.prunedConditionalUpsert(fact,
      rows.toDF("f_id", "f_did", "f_val")
        .select(col("f_id"), col("f_did"), dec(col("f_val")).as("f_val"),
          lit(null).cast("timestamp").as("loaded_at"),
          lit(null).cast("timestamp").as("last_upd_at")),
      pk = Seq("f_id"), tracked = Seq("f_did", "f_val"),
      runTs = lit("2024-01-01 00:00:00").cast("timestamp"), nParts = 4,
      keepVersions = 8)
  }

  private def maintain(dim: java.nio.file.Path, fact: java.nio.file.Path,
      view: java.nio.file.Path): MatViews.MaintainJoinResult =
    MatViews.maintainJoin(spark, dim, fact, view,
      pkLeft = Seq("d_id"), pkRight = Seq("f_id"),
      joinKeysLeft = Seq("d_id"), joinKeysRight = Seq("f_did"),
      keys = Seq("d_grp"), sums = Map("f_val" -> "sum_val"),
      counts = Map("f_val" -> "cnt_val"),
      mins = Map("f_val" -> "min_val"), maxs = Map("f_val" -> "max_val"),
      keepVersions = 2)

  private def truth(dim: java.nio.file.Path,
      fact: java.nio.file.Path): DataFrame =
    Storage.readPartitionedVersion(spark, dim).alias("d")
      .join(Storage.readPartitionedVersion(spark, fact).alias("f"),
        col("d.d_id") === col("f.f_did"))
      .groupBy(col("d_grp"))
      .agg(count(lit(1)).as("count_rows"), sum("f_val").as("sum_val"),
        count(col("f_val")).as("cnt_val"),
        min("f_val").as("min_val"), max("f_val").as("max_val"))

  private def assertExact(dim: java.nio.file.Path, fact: java.nio.file.Path,
      view: java.nio.file.Path): Unit = {
    val got = Storage.readVersion(spark, view)
      .select("d_grp", "count_rows", "sum_val", "cnt_val", "min_val", "max_val")
      .collect().map(r => r.toSeq.map(String.valueOf)).toSet
    val want = truth(dim, fact)
      .collect().map(r => r.toSeq.map(String.valueOf)).toSet
    assert(got == want, s"join view diverged:\n got  $got\n want $want")
  }

  test("maintainJoin: bootstrap, both-side churn, group moves and deletes — each exact") {
    val (dim, fact, view) = fixture()
    loadDim(dim, (1L to 10L).map(i => (i, s"g${i % 3}")))
    loadFact(fact, (1L to 60L).map(i => (i, i % 10 + 1, BigDecimal(i))))
    maintain(dim, fact, view)
    assertExact(dim, fact, view)
    // fact-side churn: value updates, deletes, inserts (incl. an orphan
    // FK that matches no dim row — must not appear in any group). Row 3
    // (id 3 → dim 4 → g1) jumps to 300, a new per-group max; id 60 held
    // g1's old max (60) and SURVIVES, so the raised max is the
    // ins-beats-ret exemption, not a recompute
    import spark.implicits._
    loadFact(fact, Seq((3L, 4L, BigDecimal(300)), (61L, 99L, BigDecimal(7)),
      (62L, 5L, BigDecimal(8))))
    MergeOps.prunedDelete(fact, Seq(10L, 20L).toDF("f_id"), pk = Seq("f_id"),
      nParts = 4)
    val r1 = maintain(dim, fact, view)
    assertExact(dim, fact, view)
    assert(MatViews.appliedBases(view).contains((r1.appliedLeft, r1.appliedRight)))
    // delete the row now holding g1's MAX (id 3, value 300): the
    // retraction ties the stored max with no covering insert → exactly
    // that one group re-joins (g1's min, 6, is untouched by the delete)
    MergeOps.prunedDelete(fact, Seq(3L).toDF("f_id"), pk = Seq("f_id"),
      nParts = 4)
    val rMax = maintain(dim, fact, view)
    assert(rMax.recomputedGroups == 1,
      s"max-holder delete must re-join its group: $rMax")
    assertExact(dim, fact, view)
    // dim-side churn: moving a member between groups re-buckets ALL its
    // fact rows (the ΔA ⋈ B₁ term carries retract+insert per row)
    loadDim(dim, Seq((4L, "g9")))
    maintain(dim, fact, view)
    assertExact(dim, fact, view)
    // no-op: both bases unchanged → same view version back
    val r3 = maintain(dim, fact, view)
    val r4 = maintain(dim, fact, view)
    assert(r3.viewVersion == r4.viewVersion)
    Storage.deleteRecursively(dim.getParent)
  }

  test("matching join aggregate re-plans onto the view; guards fall back") {
    val (dim, fact, view) = fixture()
    loadDim(dim, (1L to 10L).map(i => (i, s"g${i % 3}")))
    loadFact(fact, (1L to 60L).map(i => (i, i % 10 + 1, BigDecimal(i))))
    maintain(dim, fact, view)
    MatViews.registerJoinRewrite(spark, "mvj", dim, fact, view,
      joinKeys = Seq("d_id" -> "f_did"), keys = Seq("d_grp"),
      sums = Map("f_val" -> "sum_val"), counts = Map("f_val" -> "cnt_val"))
    withRule {
      def dimDf() = Storage.readPartitionedVersion(spark, dim)
      def factDf() = Storage.readPartitionedVersion(spark, fact)
      def shape(j: DataFrame) = j.groupBy("d_grp")
        .agg(count(lit(1)).as("cnt"), sum("f_val").as("s"),
          count(col("f_val")).as("c"))
      val q = shape(dimDf().join(factDf(), col("d_id") === col("f_did")))
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(view.toString)), s"expected view scan: $paths")
      assert(!paths.exists(_.contains(fact.toString)), s"fact must not scan: $paths")
      MatView.clear()
      val want = shape(dimDf().join(factDf(), col("d_id") === col("f_did")))
        .orderBy("d_grp").collect().toSeq
      assert(q.orderBy("d_grp").collect().toSeq == want)
      // flipped orientation matches too
      MatViews.registerJoinRewrite(spark, "mvj", dim, fact, view,
        joinKeys = Seq("d_id" -> "f_did"), keys = Seq("d_grp"),
        sums = Map("f_val" -> "sum_val"), counts = Map("f_val" -> "cnt_val"))
      val flipped = shape(factDf().join(dimDf(), col("f_did") === col("d_id")))
      assert(scanPaths(flipped).exists(_.contains(view.toString)),
        "flipped join order must still rewrite")
      assert(flipped.orderBy("d_grp").collect().toSeq == want)
      // a key filter commutes; a measure filter must not rewrite
      val keyFiltered = shape(dimDf().filter(col("d_grp") =!= "g0")
        .join(factDf(), col("d_id") === col("f_did")))
      assert(scanPaths(keyFiltered).exists(_.contains(view.toString)))
      assert(keyFiltered.collect().map(_.getLong(1)).sum ==
        want.filter(_.getString(0) != "g0").map(_.getLong(1)).sum)
      val measureFiltered = shape(dimDf()
        .join(factDf().filter(col("f_val") > 10), col("d_id") === col("f_did")))
      assert(!scanPaths(measureFiltered).exists(_.contains(view.toString)),
        "measure filter must fall back")
      // an extra join conjunct is a different relation
      val extraCond = shape(dimDf().join(factDf(),
        col("d_id") === col("f_did") && col("d_id") =!= lit(5L)))
      assert(!scanPaths(extraCond).exists(_.contains(view.toString)),
        "extra join conjunct must fall back")
      // staleness: advance the fact without maintaining
      loadFact(fact, Seq((63L, 5L, BigDecimal(9))))
      val stale = shape(dimDf().join(factDf(), col("d_id") === col("f_did")))
      assert(!scanPaths(stale).exists(_.contains(view.toString)),
        "stale view must fall back")
      assert(stale.collect().map(_.getLong(1)).sum == 61)
      // compact to single-owner (the rewrite's scan shape) + re-maintain
      // → rewrite resumes
      Storage.compact(spark, fact)
      maintain(dim, fact, view)
      val again = shape(dimDf().join(factDf(), col("d_id") === col("f_did")))
      assert(scanPaths(again).exists(_.contains(view.toString)),
        "re-maintained view must rewrite")
      assert(again.collect().map(_.getLong(1)).sum == 61)
      // a RENAMED join key (withColumnRenamed before the join) still
      // navigates: the substitution collapses the pure rename alias back
      // to the stored column's identity
      val renamed = shape(factDf().withColumnRenamed("f_did", "fk")
        .join(dimDf(), col("fk") === col("d_id")))
      assert(scanPaths(renamed).exists(_.contains(view.toString)),
        "a renamed join key must still navigate")
      assert(renamed.orderBy("d_grp").collect().map(_.getLong(1)).sum == 61)
    }
    Storage.deleteRecursively(dim.getParent)
  }
}

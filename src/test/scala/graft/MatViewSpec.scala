package graft

import java.nio.file.Files

import graft.ops.Storage
import graft.plans.{MatView, MatViewRewrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Transparent materialized-view rewrite: matching aggregates over a
  * registered base scan re-plan onto the maintained view (rollup from
  * partials); every guard fails toward scanning the base. */
class MatViewSpec extends SparkTestBase {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ MatViewRewrite
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq MatViewRewrite)
      MatView.clear()
    }
  }

  /** base(k1 string, k2 long, x decimal) + its (k1,k2) view, registered. */
  private def fixture(): (java.nio.file.Path, java.nio.file.Path) = {
    import spark.implicits._
    val root = Files.createTempDirectory("mv_fix")
    val base = root.resolve("base")
    val view = root.resolve("view")
    val rows = (1 to 500).map { i =>
      (s"t${i % 3}", (i % 7).toLong, BigDecimal(i) / 100)
    }.toDF("k1", "k2", "x")
      .select(col("k1"), col("k2"), col("x").cast("decimal(38,6)").as("x"))
    Storage.commitVersion(rows, base)
    val v = Storage.readVersion(spark, base)
      .groupBy("k1", "k2")
      .agg(count(lit(1)).as("count_rows"), sum("x").as("sum_x"),
        min("x").as("min_x"), max("x").as("max_x"))
    Storage.commitVersion(v, view)
    val vdir = base.resolve(s"v${Storage.currentVersion(base).get}")
    MatView.register(MatView.Def(
      name = "t", baseRoots = Set(MatView.root(vdir)),
      view = () => Storage.readVersion(spark, view),
      keys = Seq("k1", "k2"), countCol = Some("count_rows"),
      sums = Map("x" -> "sum_x"), mins = Map("x" -> "min_x"),
      maxs = Map("x" -> "max_x")))
    (base, view)
  }

  test("matching aggregate re-plans onto the view; results identical") {
    val (base, view) = fixture()
    withRule {
      val q = Storage.readVersion(spark, base).groupBy("k1", "k2")
        .agg(count(lit(1)).as("cnt"), sum("x").as("s"),
          min("x").as("mn"), max("x").as("mx"))
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(view.toString)), s"expected view scan, got $paths")
      assert(!paths.exists(_.contains(base.toString)), s"base must not be scanned: $paths")
      MatView.clear() // compute the truth WITHOUT the rewrite
      val truth = Storage.readVersion(spark, base).groupBy("k1", "k2")
        .agg(count(lit(1)).as("cnt"), sum("x").as("s"),
          min("x").as("mn"), max("x").as("mx"))
      assert(q.orderBy("k1", "k2").collect().toSeq ==
        truth.orderBy("k1", "k2").collect().toSeq)
    }
  }

  test("subset-key rollup with a key filter rewrites and re-aggregates") {
    val (base, view) = fixture()
    withRule {
      val q = Storage.readVersion(spark, base)
        .filter(col("k2") >= 2 && col("k2") <= 5)
        .groupBy("k1")
        .agg(count(lit(1)).as("cnt"), sum("x").as("s"), max("x").as("mx"))
      assert(scanPaths(q).exists(_.contains(view.toString)))
      MatView.clear()
      val truth = Storage.readVersion(spark, base)
        .filter(col("k2") >= 2 && col("k2") <= 5)
        .groupBy("k1")
        .agg(count(lit(1)).as("cnt"), sum("x").as("s"), max("x").as("mx"))
      assert(q.orderBy("k1").collect().toSeq == truth.orderBy("k1").collect().toSeq)
    }
  }

  test("global (no-group) aggregate rewrites too") {
    val (base, view) = fixture()
    withRule {
      val q = Storage.readVersion(spark, base).agg(count(lit(1)).as("cnt"), sum("x").as("s"))
      assert(scanPaths(q).exists(_.contains(view.toString)))
      val Array(row) = q.collect()
      assert(row.getLong(0) == 500)
    }
  }

  test("stale view falls back to the base scan") {
    val (base, view) = fixture()
    val d = MatView.all.head
    MatView.register(d.copy(fresh = () => false))
    withRule {
      val q = Storage.readVersion(spark, base).groupBy("k1", "k2")
        .agg(count(lit(1)).as("cnt"))
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(base.toString)))
      assert(!paths.exists(_.contains(view.toString)))
    }
  }

  test("unsupported shapes leave the plan untouched") {
    val (base, view) = fixture()
    withRule {
      // avg is not a maintained partial
      val q1 = Storage.readVersion(spark, base).groupBy("k1").agg(avg("x").as("a"))
      assert(!scanPaths(q1).exists(_.contains(view.toString)))
      // distinct count cannot come from partials
      val q2 = Storage.readVersion(spark, base).groupBy("k1")
        .agg(countDistinct("k2").as("d"))
      assert(!scanPaths(q2).exists(_.contains(view.toString)))
      // filter on a NON-key column does not commute with the group-by
      val q3 = Storage.readVersion(spark, base).filter(col("x") > 1)
        .groupBy("k1").agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(q3).exists(_.contains(view.toString)))
      // a base commit changes the scanned version dir — auto-invalidation
      Storage.commitVersion(Storage.readVersion(spark, base).limit(10), base)
      val q4 = Storage.readVersion(spark, base).groupBy("k1").agg(count(lit(1)).as("cnt"))
      assert(!scanPaths(q4).exists(_.contains(view.toString)))
      assert(q4.collect().map(_.getLong(1)).sum == 10)
    }
  }

  test("downstream operators over the rewritten aggregate keep working") {
    val (base, view) = fixture()
    withRule {
      // order-by + projection + a second filter above the aggregate all
      // reference the ORIGINAL output attrs — exprIds must be preserved
      val q = Storage.readVersion(spark, base).groupBy("k1", "k2")
        .agg(sum("x").as("s"))
        .filter(col("s") > 0)
        .select(concat(col("k1"), lit("#"), col("k2")).as("key"), col("s"))
        .orderBy(desc("s"))
      assert(scanPaths(q).exists(_.contains(view.toString)))
      assert(q.count() == 21) // 3 k1 × 7 k2 groups, all positive sums
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-shot construction of every registry query's DataFrame, shared by
  * the registry-sweep tests (QueriesSpec's run/column sweeps, PlanSpec's
  * plan lints). CONSTRUCTION is the expensive part — the mat-view and
  * streaming gate rows replay whole churned fixtures when their
  * DataFrame is built (and return a localCheckpoint, so the plan and the
  * rows survive their tempdir cleanup) — and before this cache each of
  * the four sweeps paid it again (~200 s apiece, the bulk of the
  * suite's wall time). The cached DataFrames are exactly what a single
  * sweep held anyway; re-counting or re-reading plans from them is
  * cheap. Sequential suite execution means no contention; synchronized
  * for safety. */
object BuiltQueries {
  private var cache: Option[Seq[(String, DataFrame)]] = None

  def all(spark: SparkSession, sfDir: String): Seq[(String, DataFrame)] =
    synchronized {
      cache.getOrElse {
        val built = queries.Registry.all.map(q => q.name -> q.fn(spark, sfDir))
        cache = Some(built)
        built
      }
    }
}

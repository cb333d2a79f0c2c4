package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Navigation observability — the first question a user asks when a
  * dashboard's latency changes: WHICH materialized view served my
  * aggregate, and why did the others fall back?
  *
  * [[explain]] walks the DataFrame's OPTIMIZED plan (rewrites, if any,
  * have already happened): an Aggregate whose scan is a registered view's
  * table reports `servedBy`; every other Aggregate is probed against
  * every registration through the SAME guard sequence the rewrite rules
  * run ([[MatViewRewrite.probeDef]] / [[MatViewJoinRewrite.probeStar]] —
  * one code path, so the diagnosis can never drift from the behavior),
  * with each first-failing guard rendered as a reason: root mismatch,
  * unmatched WHERE slice, staleness, join-edge mismatch, unservable
  * shape. A probe that fully matches on a plan that was NOT rewritten
  * reports "would navigate" — the tell that the optimizer rule isn't
  * installed in this session.
  *
  * Diagnostic-only cost: the per-registration freshness/marker reads run
  * here (lazily-forced reasons); the hot rewrite path never pays them for
  * non-matching views.
  */
object MatViewExplain {

  /** One Aggregate's navigation outcome. `servedBy` names the view whose
    * table the (already-rewritten) aggregate scans; otherwise `reasons`
    * carries (view name, first failing guard) per registration. */
  final case class AggReport(
      aggregate: String,
      servedBy: Option[String],
      reasons: Seq[(String, String)]) {
    def render: String = servedBy match {
      case Some(n) => s"Aggregate [$aggregate]\n  served by view '$n'"
      case None if reasons.isEmpty =>
        s"Aggregate [$aggregate]\n  no views registered"
      case None =>
        s"Aggregate [$aggregate]\n" + reasons.map { case (n, r) =>
          s"  view '$n': $r" }.mkString("\n")
    }
  }

  /** Per-Aggregate navigation report for `df`, top-down plan order. */
  def explain(df: DataFrame): Seq[AggReport] = {
    val plan = df.queryExecution.optimizedPlan
    val approx = scala.util.Try(df.sparkSession.conf
      .get(MatViewRewrite.ApproxDistinctKey, "false").toBoolean).getOrElse(false)
    val defs = MatView.all
    val stars = MatView.allStars
    def scansOf(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Set[String] =
      p.collect { case lr: LogicalRelation =>
        MatViewSupport.scanRoots(lr) }.flatten.toSet
    // what each registration's VIEW table scans right now — an Aggregate
    // reading exactly that is a served one (thunks that throw — e.g. a
    // view with no commits yet — index as unmatched)
    val servedIndex: Seq[(String, Set[String])] =
      defs.map(d => d.name -> scala.util.Try(
        scansOf(d.view().queryExecution.analyzed)).getOrElse(Set.empty)) ++
        stars.map(d => d.name -> scala.util.Try(
          scansOf(d.view().queryExecution.analyzed)).getOrElse(Set.empty))
    plan.collect { case agg: Aggregate =>
      val aggScans = scansOf(agg)
      // served = the aggregate reads exactly some view's root set; two
      // registrations can share a view table (e.g. an exact and an
      // approx panel over one state), in which case naming the first
      // would be a guess — report the ambiguity instead. A strict-subset
      // read of a view's roots is NOT a served aggregate (the rewrite
      // rules never produce one), so it falls through to probing.
      val exact = servedIndex.collect {
        case (n, vr) if vr.nonEmpty && vr == aggScans => n
      }
      val served = exact match {
        case Seq(n) => Some(n)
        case Seq() => None
        case many => Some(many.mkString("<ambiguous: ", ", ", ">"))
      }
      val reasons: Seq[(String, String)] =
        if (served.isDefined) Nil
        else {
          lazy val flat = MatViewRewrite.shapeOf(agg)
          lazy val star = MatViewJoinRewrite.starShapeOf(agg)
          defs.map { d =>
            d.name -> (flat match {
              case Left(r) => r
              case Right((aggS, e, f, roots)) =>
                MatViewRewrite.probeDef(aggS, e, f, roots, d,
                  scala.util.Try(d.baseRoots()).getOrElse(Set.empty), approx)
                  .fold(reason => reason(), _ =>
                    "matches — would navigate (is MatViewRewrite installed " +
                      "as an optimizer rule in this session?)")
            })
          } ++ stars.map { d =>
            d.name -> (star match {
              case Left(r) => r
              case Right(sh) =>
                MatViewJoinRewrite.probeStar(sh, d,
                  scala.util.Try(d.roots.map(_())).getOrElse(
                    d.roots.map(_ => Set.empty[String])), approx)
                  .fold(reason => reason(), _ =>
                    "matches — would navigate (is MatViewJoinRewrite " +
                      "installed as an optimizer rule in this session?)")
            })
          }
        }
      AggReport(summarize(agg), served, reasons)
    }
  }

  /** Render the full report as one readable block. */
  def explainString(df: DataFrame): String =
    explain(df).map(_.render).mkString("\n")

  private def summarize(agg: Aggregate): String = {
    val groups = agg.groupingExpressions.map(_.sql).mkString(", ")
    val outs = agg.aggregateExpressions.map(_.name).mkString(", ")
    val s = if (groups.isEmpty) s"global: $outs" else s"group by $groups: $outs"
    if (s.length <= 120) s else s.take(117) + "..."
  }
}

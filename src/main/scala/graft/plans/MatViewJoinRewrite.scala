package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Aggregate navigation: rewrite
  *     Aggregate(G, aggs, [Filter]* Join(A, B, Inner, a.k = b.k [AND …]))
  * onto a registered maintained JOIN view ([[MatView.JoinDef]]) —
  *     Aggregate(G', aggs', [Filter']* Scan(view))
  * — the two-table form of [[MatViewRewrite]], sharing its shape
  * validation and rebuild ([[MatViewSupport.rebuildOntoView]]): grouping
  * columns must be view keys, filters must reference only view keys,
  * aggregates must be servable partials, the view must be fresh.
  *
  * What is join-specific:
  *   - BOTH sides must strip (through Filters / pass-through Projects) to
  *     file scans whose root sets EQUAL the registration's two declared
  *     sets, in either orientation (A⋈B and B⋈A both match);
  *   - the join must be INNER with a condition that is exactly the
  *     registered conjunction of column equalities — a missing or extra
  *     conjunct is a different relation and never matches;
  *   - the two sides' output column names must be fully DISJOINT: the
  *     view addresses columns by bare name, and an ambiguous name could
  *     silently bind to the wrong side (star schemas' o_/c_ prefix
  *     conventions satisfy this; anything else falls back to the base);
  *   - `IsNotNull(join key)` filters are accepted and DROPPED rather than
  *     remapped: the optimizer infers them from the inner join's
  *     constraints, and every view row is a joined row, so they are
  *     tautological over the view (which need not even carry the key).
  *
  * Filters pushed below the join commute back up: a predicate over one
  * side's view-key columns satisfies Filter(A) ⋈ B = Filter(A ⋈ B), and
  * view-key predicates commute with the group-by — so side filters and
  * above-join filters are pooled and applied to the view verbatim.
  *
  * Scale shape: at 100 TB an ad-hoc fact⋈dim rollup is a giant shuffle
  * join; the rewrite turns it into a scan of |keys| pre-joined,
  * pre-aggregated rows, maintained for O(Δ) per refresh by
  * [[graft.ops.ViewMaintain.joinDelta]].
  */
object MatViewJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.matviewJoinRewrite.enabled"

  def apply(plan: LogicalPlan): LogicalPlan = {
    val defs = MatView.allJoins
    if (defs.isEmpty || !conf.getConfString(EnabledKey, "true").toBoolean) plan
    else {
      // one filesystem probe per registration per PASS, not per Aggregate
      val leftOf = MatViewSupport.memo((d: MatView.JoinDef) => d.leftRoots())
      val rightOf = MatViewSupport.memo((d: MatView.JoinDef) => d.rightRoots())
      plan.transform {
        case agg @ Aggregate(_, _, _, _) =>
          tryRewrite(agg, defs, leftOf, rightOf).getOrElse(agg)
      }
    }
  }

  /** Peel Filters / pass-through Projects down to a Join node. */
  private def stripToJoin(p: LogicalPlan, filters: Seq[Expression])
      : Option[(Seq[Expression], Join)] = p match {
    case Filter(cond, child) => stripToJoin(child, filters :+ cond)
    case Project(exprs, child) if exprs.forall(MatViewSupport.alignOnly) =>
      stripToJoin(child, filters)
    case j: Join => Some((filters, j))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def tryRewrite(agg: Aggregate, defs: Seq[MatView.JoinDef],
      leftOf: MatView.JoinDef => Set[String],
      rightOf: MatView.JoinDef => Set[String]): Option[LogicalPlan] = {
    val (topFilters, join) = stripToJoin(agg.child, Nil) match {
      case Some(x) => x
      case None => return None
    }
    if (join.joinType != Inner || join.condition.isEmpty) return None
    val (lFilters, lRel) = MatViewSupport.strip(join.left, Nil) match {
      case Some(x) => x
      case None => return None
    }
    val (rFilters, rRel) = MatViewSupport.strip(join.right, Nil) match {
      case Some(x) => x
      case None => return None
    }
    // ambiguity guard: the view binds columns by bare name
    val lNames = join.left.output.map(_.name).toSet
    val rNames = join.right.output.map(_.name).toSet
    if ((lNames & rNames).nonEmpty) return None
    // the condition must be PURE column-equality conjuncts, each pairing
    // one left column with one right column
    val pairs: Seq[(String, String)] = conjuncts(join.condition.get).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if lNames.contains(a.name) && rNames.contains(b.name) =>
        (a.name, b.name)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if rNames.contains(a.name) && lNames.contains(b.name) =>
        (b.name, a.name)
      case _ => return None
    }
    val lRoots = MatViewSupport.scanRoots(lRel)
    val rRoots = MatViewSupport.scanRoots(rRel)

    defs.view.flatMap { d =>
      // orientation: query(left,right) = registration(left,right) or flipped
      val oriented: Option[Seq[(String, String)]] =
        if (MatViewSupport.covers(lRoots, leftOf(d)) &&
            MatViewSupport.covers(rRoots, rightOf(d))) Some(pairs)
        else if (MatViewSupport.covers(lRoots, rightOf(d)) &&
            MatViewSupport.covers(rRoots, leftOf(d))) Some(pairs.map(_.swap))
        else None
      oriented.flatMap { ps =>
        if (ps.toSet != d.joinKeys.toSet) None
        else {
          // split every filter into conjuncts first (the optimizer folds
          // inferred guards into one AND); IsNotNull on a join-key column
          // is implied by the inner join — drop it; every remaining
          // conjunct must survive the key-only check
          val keyNames = d.joinKeys.flatMap { case (a, b) => Seq(a, b) }.toSet
          val kept = (topFilters ++ lFilters ++ rFilters)
            .flatMap(conjuncts)
            .filterNot {
              case IsNotNull(a: AttributeReference) => keyNames.contains(a.name)
              case _ => false
            }
          MatViewSupport.rebuildOntoView(agg, kept, d.keys, d.partials,
            d.fresh, d.view)
        }
      }
    }.headOption
  }
}

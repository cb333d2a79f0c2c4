package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Aggregate navigation over an N-ary join: rewrite
  *     Aggregate(G, aggs, [Filter]* Join(… Join(T₁, T₂) …, Tₙ, Inner, eq))
  * onto a registered maintained star view ([[MatView.StarDef]]) —
  *     Aggregate(G', aggs', [Filter']* Scan(view))
  * — the join form of [[MatViewRewrite]], sharing its shape validation
  * and rebuild ([[MatViewSupport.rebuildOntoView]] /
  * [[MatViewSupport.rebuildRollupOntoView]] for ROLLUP/CUBE/GROUPING SETS
  * over the join): grouping columns must be view keys, filters must
  * reference only view keys, aggregates must be servable partials, the
  * view must be fresh. The reference's richest fact resolves THREE
  * dimensions in one load (/root/reference/dags/dwh_fact_charer_location
  * .py:103-115, FKs at configure.py:344-354) — exactly the fact⋈dim⋈dim
  * rollup this rule navigates.
  *
  * What is join-specific:
  *   - the plan under the Aggregate must FLATTEN to a tree of INNER joins
  *     whose every leaf strips (through Filters / pass-through Projects)
  *     to a file scan, with every join carrying a condition of PURE
  *     column-equality conjuncts — any other node, join type, or
  *     condition shape fails the flatten and falls back;
  *   - the leaves must match the registration's sides ONE-TO-ONE by scan
  *     root set, in any order and any tree shape (A⋈B, B⋈A, and every
  *     parenthesization of a 3-way join all match the same view);
  *   - the pooled condition conjuncts — as UNORDERED name pairs, valid
  *     because all side columns are disjoint by contract — must equal the
  *     registered `joinKeys` set exactly: a missing or extra conjunct is
  *     a different relation and never matches;
  *   - every column name the rewrite BINDS (grouping, filters, aggregate
  *     children, join keys) must belong to exactly one side: the view
  *     addresses columns by bare name, and an ambiguous name could
  *     silently bind to the wrong side (star schemas' o_/c_/n_ prefix
  *     conventions satisfy this; anything else falls back to the base).
  *     Unreferenced collisions — the bookkeeping columns every stored
  *     table carries — are harmless and ignored;
  *   - `IsNotNull(join key)` filters are accepted and DROPPED rather than
  *     remapped: the optimizer infers them from the inner joins'
  *     constraints, and every view row is a joined row, so they are
  *     tautological over the view (which need not even carry the key).
  *
  * Filters pushed below a join commute back up: a predicate over one
  * side's view-key columns satisfies Filter(A) ⋈ B = Filter(A ⋈ B), and
  * view-key predicates commute with the group-by — so side filters and
  * above-join filters are pooled and applied to the view verbatim.
  *
  * Scale shape: at 100 TB an ad-hoc fact⋈dim⋈dim rollup is two giant
  * shuffle joins; the rewrite turns it into a scan of |keys| pre-joined,
  * pre-aggregated rows, maintained for O(Δ) per refresh by
  * [[graft.ops.ViewMaintain.starDelta]].
  */
object MatViewJoinRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.matviewJoinRewrite.enabled"

  def apply(plan: LogicalPlan): LogicalPlan = {
    val defs = MatView.allStars
    if (defs.isEmpty || !conf.getConfString(EnabledKey, "true").toBoolean) plan
    else {
      // the KMV approx-distinct gate is shared with the single-base rule:
      // one session conf opts into estimate-for-exact on both shapes
      val approx = conf.getConfString(
        MatViewRewrite.ApproxDistinctKey, "false").toBoolean
      // one filesystem probe per registration SIDE per pass, not per
      // Aggregate (root thunks read version pointers/manifests)
      val rootsOf = MatViewSupport.memo((d: MatView.StarDef) => d.roots.map(_()))
      plan.transform {
        case agg @ Aggregate(_, _, _, _) =>
          tryRewrite(agg, defs, rootsOf, approx).getOrElse(agg)
      }
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Flatten a tree of INNER equi-joins: peel Filters / Projects at every
    * level, recurse through Join nodes, and strip each leaf to a
    * file-source relation. Project outputs are pass-through columns
    * ([[MatViewSupport.alignOnly]]) or DETERMINISTIC computed aliases —
    * the synthesized join keys of the unknown-member shape — which are
    * recorded in a substitution map (alias id → defining expression,
    * chained derivations resolved transitively) instead of failing the
    * flatten. Returns the pooled filter conjuncts, the leaves in tree
    * order, the pooled join-condition conjuncts, and the substitution —
    * or None if ANY node fails (an outer join, a joinless subquery, a
    * condition-less cross join, a non-deterministic projection). */
  private def flatten(p: LogicalPlan)
      : Option[(Seq[Expression], Seq[LogicalRelation], Seq[Expression],
          Map[ExprId, Expression])] =
    p match {
      case Filter(cond, child) =>
        flatten(child).map { case (f, ls, cs, m) => (cond +: f, ls, cs, m) }
      case Project(exprs, child) =>
        flatten(child).flatMap { case (f, ls, cs, m) =>
          val extra = Map.newBuilder[ExprId, Expression]
          val ok = exprs.forall {
            case e if MatViewSupport.alignOnly(e) => true
            case al @ Alias(e, _) if e.deterministic =>
              extra += al.exprId -> e.transform {
                case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
              }
              true
            case _ => false
          }
          if (ok) Some((f, ls, cs, m ++ extra.result())) else None
        }
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        for {
          (fl, ll, cl, ml) <- flatten(j.left)
          (fr, lr, cr, mr) <- flatten(j.right)
        } yield (fl ++ fr, ll ++ lr, cl ++ cr ++ conjuncts(j.condition.get),
          ml ++ mr)
      case lr: LogicalRelation => Some((Nil, Seq(lr), Nil, Map.empty))
      case _ => None
    }

  /** The def-independent part of the star match: flatten, validate the
    * condition/ambiguity guards, and package what every per-def probe
    * needs. Left = why this aggregate can never match ANY star view
    * (shared by [[MatViewExplain]] as the human-readable reason). */
  private[plans] final case class StarShape(
      agg: Aggregate,
      expand: Option[Expand],
      filters: Seq[Expression],
      pairIds: Set[Set[MatViewSupport.JoinKeyId]],
      subst: Map[ExprId, Expression],
      leafRoots: Seq[Seq[String]],
      namesPerLeaf: Seq[Set[String]]) {
    private[plans] def unambiguous(n: String): Boolean =
      namesPerLeaf.count(_.contains(n)) == 1
    private[plans] def idOf(e: Expression): MatViewSupport.JoinKeyId = {
      val substituted = e.transform {
        case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
      }
      substituted match {
        // a substitution that resolves to a BARE column is a pure rename
        // alias (`withColumnRenamed` on a join key) — identity is the
        // stored column, or a renamed stored key could never match a
        // registration's Left(name) edge
        case a: AttributeReference => scala.Left(a.name)
        case other => scala.Right(MatViewSupport.normalizeDerived(other))
      }
    }
  }

  private[plans] def starShapeOf(agg: Aggregate): Either[String, StarShape] = {
    // ROLLUP/CUBE/GROUPING SETS over the join keeps its Expand mechanics;
    // a flat aggregate flattens its child directly
    val (expandOpt, source) = agg.child match {
      case e: Expand => (Some(e), e.child)
      case other => (None, other)
    }
    val (filters, leaves, condConjuncts, subst) = flatten(source) match {
      case Some(x) => x
      case None => return scala.Left("the plan under the aggregate is not a " +
        "tree of INNER equi-joins over file scans (an outer join, a " +
        "non-equi condition, or another operator in between)")
    }
    if (leaves.size < 2)
      return scala.Left("a single-table aggregate — probe single-base views instead")
    // canonical identity of any expression over the leaves: a plain
    // column by bare name, anything touching a computed alias by its
    // substituted, normalized expression (see StarDef.pairIdSet)
    // substitute computed aliases back into the aggregate FIRST: a
    // GROUP BY over an expression of leaf columns (the analyzer pulls it
    // out as a _groupingexpression Project above the join) and a rename
    // alias both become plain expressions over leaf columns, which the
    // shared rebuild's expression-grouping path understands
    def sub(e: Expression): Expression = e.transform {
      case a: AttributeReference if subst.contains(a.exprId) => subst(a.exprId)
    }
    def subNamed(ne: NamedExpression): NamedExpression = ne match {
      case a: AttributeReference if subst.contains(a.exprId) =>
        Alias(subst(a.exprId), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case other => sub(other).asInstanceOf[NamedExpression]
    }
    val aggS = if (subst.isEmpty) agg else agg.copy(
      groupingExpressions = agg.groupingExpressions.map(sub),
      aggregateExpressions = agg.aggregateExpressions.map(subNamed))
    val shape0 = StarShape(aggS, expandOpt, filters, Set.empty, subst,
      leaves.map(MatViewSupport.scanRoots), leaves.map(_.output.map(_.name).toSet))
    // every condition conjunct must be an equality of two DISTINCT keys —
    // each a leaf column or a derived (computed-alias) key
    val pairIds: Set[Set[MatViewSupport.JoinKeyId]] = condConjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if shape0.idOf(a) != shape0.idOf(b) => Set(shape0.idOf(a), shape0.idOf(b))
      case _ => return scala.Left("a join conjunct is not a plain equality of " +
        "two distinct (stored or derived) keys")
    }.toSet
    // ambiguity guard: the view binds columns by bare name, so every name
    // the rewrite will bind — grouping columns, aggregate children,
    // Expand slots, stored join keys, and the columns inside derived-key
    // expressions — must belong to EXACTLY one leaf relation. Names NO
    // ONE references (the storage bookkeeping columns every table
    // carries) may collide freely; a referenced collision could silently
    // bind the wrong side, so it falls back instead. Grouping/aggregate/
    // Expand references must also be REAL leaf columns — an aggregate
    // over a computed alias has no view counterpart and falls back.
    // Expand OUTPUT attrs (rollup key slots, spark_grouping_id)
    // legitimately belong to no leaf and pass through.
    val shapeAttrs: Seq[AttributeReference] =
      (aggS.aggregateExpressions ++ aggS.groupingExpressions)
        .flatMap(_.references.collect { case a: AttributeReference => a }) ++
        expandOpt.toSeq.flatMap(_.projections.flatten.collect {
          case a: AttributeReference => a })
    if (shapeAttrs.exists(a => subst.contains(a.exprId) ||
        shape0.namesPerLeaf.count(_.contains(a.name)) > 1))
      return scala.Left("a grouping/aggregate column is a computed alias or an " +
        "ambiguous name — the view binds columns by bare name")
    val condRefNames: Set[String] = condConjuncts.flatMap(_.references.flatMap {
      case a: AttributeReference if subst.contains(a.exprId) =>
        subst(a.exprId).references.map(_.name).toSeq
      case a => Seq(a.name)
    }).toSet
    if (!condRefNames.forall(shape0.unambiguous))
      return scala.Left("a join-key name is ambiguous across the joined tables")
    if (shape0.leafRoots.exists(_.isEmpty))
      return scala.Left("a join leaf is not a file source")
    scala.Right(shape0.copy(pairIds = pairIds))
  }

  /** Probe ONE star registration against a shaped aggregate. Right = the
    * rewritten plan; Left = a LAZY reason ([[MatViewExplain]] forces it,
    * the hot rewrite path never does). */
  private[plans] def probeStar(sh: StarShape,
      d: MatView.StarDef, sideRoots: Seq[Set[String]],
      approxDistinct: Boolean): Either[() => String, LogicalPlan] = {
    if (matchSides(sh.leafRoots, sideRoots).isEmpty)
      return scala.Left(() => "side mismatch: the joined tables do not match " +
        "the registration's sides one-to-one by scan roots")
    val keyIds = d.pairIdSet
    if (sh.pairIds != keyIds)
      return scala.Left(() => "join-edge mismatch: the query's equi-join pairs " +
        "differ from the registered joinKeys (a missing/extra conjunct " +
        "is a different relation)")
    // split every filter into conjuncts first (the optimizer folds
    // inferred guards into one AND); IsNotNull on a join key —
    // stored column or derived expression (the optimizer infers
    // them from the equi-join and pushes them through the computed
    // Projects) — is implied by the inner joins and dropped; then a
    // FILTERED star view's required conjuncts are consumed/implied
    // exactly as on the single-base path. Every remaining conjunct
    // must reference only real, unambiguous leaf columns and
    // survive rebuildOntoView's key-only check.
    val flatKeyIds = keyIds.flatten
    // a derived key's inferred null-guard reaches the plan pushed
    // through the computed Project and simplified (IF/CASE with
    // folded literal branches) — recognize it structurally
    val derivedGuards: Set[Expression] = flatKeyIds.collect {
      case scala.Right(e) =>
        MatViewSupport.normalizeDerived(MatViewSupport.nullGuardOf(e))
    }
    def canonOf(e: Expression): Expression =
      MatViewSupport.normalizeDerived(e.transform {
        case a: AttributeReference if sh.subst.contains(a.exprId) =>
          sh.subst(a.exprId)
      })
    val pooled = sh.filters
      .flatMap(conjuncts)
      .filterNot { c =>
        (c match {
          case IsNotNull(x) => flatKeyIds.contains(sh.idOf(x))
          case _ => false
        }) || derivedGuards.contains(canonOf(c))
      }
    if (pooled.exists(_.references.exists {
        case a: AttributeReference =>
          sh.subst.contains(a.exprId) || !sh.unambiguous(a.name)
        case _ => true
      }))
      return scala.Left(() => "a filter references a computed alias or an " +
        "ambiguous column name")
    MatViewSupport.consumeWhere(pooled, d.where()) match {
      case None => scala.Left(() => "the view's WHERE slice is not carried or " +
        "implied by the query's filter conjuncts")
      case Some(kept) =>
        val rebuilt = sh.expand match {
          case Some(expand) =>
            MatViewSupport.rebuildRollupOntoView(sh.agg, expand, kept, d.keys,
              d.partials, d.fresh, d.view)
          case None =>
            MatViewSupport.rebuildOntoView(sh.agg, kept, d.keys, d.partials,
              d.fresh, d.view, approxDistinct)
        }
        rebuilt.toRight(() =>
          if (!scala.util.Try(d.fresh()).getOrElse(false))
            "stale: the view's applied-version markers lag a side's " +
              "committed version — re-run maintenance"
          else "shape: a grouping column, filter, or aggregate is not " +
            "servable from the view's keys/partials")
    }
  }

  private def tryRewrite(agg: Aggregate, defs: Seq[MatView.StarDef],
      rootsOf: MatView.StarDef => Seq[Set[String]],
      approxDistinct: Boolean): Option[LogicalPlan] =
    starShapeOf(agg).toOption.flatMap { sh =>
      defs.view.flatMap(d =>
        probeStar(sh, d, rootsOf(d), approxDistinct).toOption).headOption
    }

  /** A perfect one-to-one matching of query leaves onto registration
    * sides by root-set equality — order-free, so every join orientation
    * and parenthesization matches. Registrations keep their sides' root
    * sets pairwise distinct (a self-join view is unsupported), so greedy
    * assignment is unambiguous. */
  private def matchSides(leafRoots: Seq[Seq[String]],
      sides: Seq[Set[String]]): Option[Unit] = {
    if (leafRoots.size != sides.size) return None
    val taken = scala.collection.mutable.BitSet.empty
    leafRoots.foreach { lr =>
      sides.indices.find(i => !taken(i) && MatViewSupport.covers(lr, sides(i))) match {
        case Some(i) => taken.add(i)
        case None => return None
      }
    }
    Some(())
  }
}

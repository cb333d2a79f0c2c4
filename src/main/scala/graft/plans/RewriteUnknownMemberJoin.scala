package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Catalyst optimizer rule for the reference's unknown-member join shape
  * (SURVEY.md §4.3; ref: dwh_fact_charer_location.py:107-112):
  *
  *   probe JOIN dim ON  probe.key = dim.key
  *                   OR (probe.key IS NULL AND dim.id = <unknownId>)
  *
  * Catalyst cannot hash-join an OR-of-conjuncts — the plan degrades to
  * BroadcastNestedLoopJoin, which is O(|probe|·|dim|) and unusable at scale.
  * This rule rewrites the join to a plain equi-join on a synthetic key:
  *
  *   coalesce(cast(probe.key as string), SENTINEL)
  *     = if(dim.id = <unknownId>, SENTINEL, cast(dim.key as string))
  *
  * Equivalence (proved case-wise):
  *  - probe.key = k (non-null): LHS = "k". Original matches dim rows with
  *    key = k. Rewrite matches dim rows whose synthetic key is "k" — i.e.
  *    key = k and id ≠ unknownId. The unknown row's natural key is NULL by
  *    construction, so `key = k` could not match it originally either. ✓
  *  - probe.key IS NULL: original first disjunct is NULL (no match), second
  *    matches exactly the id = unknownId row. Rewrite: LHS = SENTINEL,
  *    matching exactly the unknown row. ✓
  *
  * REQUIRED DATA INVARIANT (not checkable at plan time): the dim row with
  * id = unknownId must have a NULL natural key. The engine's own dim
  * construction guarantees this (the seed row's url is NULL, ref:
  * configure.py:286); if a user table violated it, that row's synthetic key
  * would become the sentinel and probe rows that previously matched it via
  * the first disjunct would silently lose matches. Because the equivalence
  * proof rests on that invariant, the rule is gated behind
  * `spark.graft.rewriteUnknownMemberJoin.enabled` (default true — the
  * engine only builds conforming dims; set it false for sessions running
  * arbitrary user plans with this join shape). Natural keys must also never
  * equal the sentinel string; it embeds NUL (U+0000) characters, outside
  * any realistic key alphabet.
  *
  * This is the engine's one custom Catalyst rule — everything else is
  * expressible with built-ins (SURVEY.md §2.10). Registered via
  * [[GraftExtensions]]: `.withExtensions(new GraftExtensions)`.
  */
object RewriteUnknownMemberJoin extends Rule[LogicalPlan] {

  val Sentinel = "\u0000<graft-unknown-member>\u0000"

  val EnabledKey = "spark.graft.rewriteUnknownMemberJoin.enabled"

  def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else rewrite(plan)

  // key types whose string rendering is total and injective-enough for
  // the synthetic equi-key: strings and integrals. Timestamps would build
  // an unresolved Cast (no timeZoneId is available inside the optimizer),
  // and float/double string forms break SQL equality at 0.0 vs -0.0 —
  // those key shapes keep the original (BNLJ) plan rather than risk a
  // crash or a silently dropped match.
  private def stringSafe(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case StringType => true
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      cond match {
        case Or(EqualTo(lk, rk), And(IsNull(lk2), EqualTo(dimId, unk: Literal)))
            if lk.semanticEquals(lk2) &&
              stringSafe(lk.dataType) && stringSafe(rk.dataType) &&
              lk.references.subsetOf(left.outputSet) &&
              rk.references.subsetOf(right.outputSet) &&
              dimId.references.subsetOf(right.outputSet) =>
          val sentinel = Literal(Sentinel)
          val lKey = Alias(Coalesce(Seq(Cast(lk, StringType), sentinel)), "__graft_jk_l")()
          val rKey = Alias(
            If(EqualTo(dimId, unk), sentinel, Cast(rk, StringType)), "__graft_jk_r")()
          val newLeft = Project(left.output :+ lKey, left)
          val newRight = Project(right.output :+ rKey, right)
          Project(j.output.toSeq,
            Join(newLeft, newRight, Inner,
              Some(EqualTo(lKey.toAttribute, rKey.toAttribute)), hint))
        case _ => j
      }
  }
}

/** Session extension installing the engine's Catalyst customizations:
  * the unknown-member join rewrite, the transparent materialized-view
  * rewrite (no-op until a view is registered via [[MatView.register]]),
  * and the fused fixed-point dot product as a SQL function
  * (`SELECT graft_fixed_point_dot(a, b)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteUnknownMemberJoin)
    ext.injectOptimizerRule(_ => MatViewRewrite)
    ext.injectOptimizerRule(_ => MatViewJoinRewrite)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(FixedPointDot.FnName),
      new ExpressionInfo(classOf[FixedPointDot].getName, FixedPointDot.FnName),
      (exprs: Seq[Expression]) => FixedPointDot(exprs(0), exprs(1))))
  }
}

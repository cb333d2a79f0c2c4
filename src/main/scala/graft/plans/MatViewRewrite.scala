package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, NumericType}

/** Transparent materialized-view rewrite — the classic warehouse
  * query-rewrite the reference's datamart layer aspires to
  * (/root/reference/dags/configure.py:46-52 creates the `datamart` schema
  * but ships no queries; [[graft.ops.AggMaintain]] maintains the aggregate
  * tables incrementally, and this rule makes ad-hoc aggregates USE them
  * without the query author knowing they exist).
  *
  * A registered view declares: the base scan it covers (by resolved scan
  * root — registrations name one immutable version directory, so a base
  * commit auto-invalidates the match), its key columns (same names as the
  * base columns by contract), and which partial-aggregate columns it
  * maintains (`count_rows`-style COUNT(*), per-column SUM/MIN/MAX).
  *
  * The rule rewrites
  *     Aggregate(G, aggs, [Filter f]* [Project attrs]* Scan(base))
  * to
  *     Aggregate(G', aggs', [Filter f']* Scan(view))
  * when:
  *   - every scan root resolves inside a registered base root;
  *   - every grouping expression is a plain base column that is a view
  *     key (a SUBSET of the keys is fine — the rewrite re-aggregates the
  *     view: COUNT→SUM(count_rows), SUM→SUM(sum), MIN→MIN(min),
  *     MAX→MAX(max) are all reassociable);
  *   - every filter references only view-key columns (such filters
  *     commute with the group-by, so they apply verbatim to the view);
  *   - every aggregate is a non-DISTINCT, un-FILTERed COUNT(*) / COUNT(1)
  *     / SUM / MIN / MAX over a maintained column, with a loss-free
  *     result type (identical, or numeric-to-numeric cast);
  *   - the view is FRESH (`fresh()` — e.g. its applied base version
  *     equals the base's committed version).
  * Anything else leaves the plan untouched — the rewrite must never turn
  * a correct plan into a wrong one, so every guard fails toward "scan the
  * base".
  *
  * Scale shape: the view holds |keys| rows versus the base's |rows|; at
  * 100 TB the rewrite turns a full-table scan + shuffle into a scan of a
  * few thousand pre-aggregated rows. Output attribute ids are preserved
  * (aliases carry the original exprIds), so the surrounding plan — joins,
  * sorts, further projections — is undisturbed.
  *
  * Install session-wide via [[GraftExtensions]] or per-query via
  * `spark.experimental.extraOptimizations`.
  */
object MatView {

  /** One registered materialized view. `baseRoots` are canonicalized
    * absolute paths the base scan's root paths must resolve within;
    * `view` reads the CURRENT maintained state (invoked at rewrite time);
    * `sums`/`mins`/`maxs` map base column name → view partial column. */
  final case class Def(
      name: String,
      baseRoots: Set[String],
      view: () => DataFrame,
      keys: Seq[String],
      countCol: Option[String] = None,
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      fresh: () => Boolean = () => true)

  private val reg = new java.util.concurrent.ConcurrentHashMap[String, Def]

  def register(d: Def): Unit = reg.put(d.name, d)
  def drop(name: String): Unit = reg.remove(name)
  def clear(): Unit = reg.clear()
  def all: Seq[Def] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.toSeq.sortBy(_.name)
  }

  private[plans] def canonical(p: String): String =
    java.nio.file.Paths.get(
      if (p.startsWith("file:")) java.net.URI.create(p).getPath else p
    ).toAbsolutePath.normalize.toString

  /** Canonical root for registration, from a filesystem path. */
  def root(p: java.nio.file.Path): String = canonical(p.toString)
}

object MatViewRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.matviewRewrite.enabled"

  def apply(plan: LogicalPlan): LogicalPlan = {
    val defs = MatView.all
    if (defs.isEmpty || !conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transform {
      case agg @ Aggregate(_, _, _, _) =>
        tryRewrite(agg, defs).getOrElse(agg)
    }
  }

  /** Peel attribute-only Projects and Filters off the aggregate's child,
    * accumulating filter conditions, down to a file-source relation. */
  private def strip(p: LogicalPlan, filters: Seq[Expression])
      : Option[(Seq[Expression], LogicalRelation)] = p match {
    case Filter(cond, child) => strip(child, filters :+ cond)
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      strip(child, filters)
    case lr: LogicalRelation => Some((filters, lr))
    case _ => None
  }

  private def scanRoots(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.map(rp => MatView.canonical(rp.toUri.toString))
    case _ => Seq.empty
  }

  private def covers(roots: Seq[String], bases: Set[String]): Boolean =
    roots.nonEmpty && roots.forall(r =>
      bases.exists(b => r == b || r.startsWith(b + java.io.File.separator)))

  // a rewritten aggregate's result must be byte-identical or a loss-free
  // numeric widening of the original's — otherwise no rewrite
  private def typeOk(from: DataType, to: DataType): Boolean =
    from == to || (from.isInstanceOf[NumericType] && to.isInstanceOf[NumericType])

  private def tryRewrite(agg: Aggregate, defs: Seq[MatView.Def]): Option[LogicalPlan] = {
    val (filters, rel) = strip(agg.child, Nil) match {
      case Some(x) => x
      case None => return None
    }
    val roots = scanRoots(rel)
    defs.view.flatMap(d => rewriteWith(agg, filters, roots, d)).headOption
  }

  private def rewriteWith(
      agg: Aggregate, filters: Seq[Expression], roots: Seq[String],
      d: MatView.Def): Option[LogicalPlan] = {
    if (!covers(roots, d.baseRoots)) return None
    val keySet = d.keys.toSet
    // grouping: plain base columns, each a view key
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if keySet.contains(a.name) => a.name
      case _ => return None
    }
    // filters: only view-key columns (commute with the group-by)
    if (!filters.forall(_.references.forall(a => keySet.contains(a.name))))
      return None
    // every output is either a grouping column or a rewritable aggregate
    // — possibly under a Cast (CollapseProject merges a projection's
    // casts INTO the aggregate list before extra optimizations run)
    val groupedAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference => a.exprId }.toSet
    def asAgg(e: Expression): Option[(AggregateExpression, Expression => Expression)] =
      e match {
        case ae: AggregateExpression => Some((ae, identity[Expression]))
        case c: Cast => c.child match {
          case ae: AggregateExpression =>
            Some((ae, (x: Expression) => c.withNewChildren(Seq(x))))
          case _ => None
        }
        case _ => None
      }
    def partialFor(fn: AggregateFunction): Option[(String, AggregateFunction => AggregateFunction)] =
      fn match {
        case c: Count if c.children.size == 1 && c.children.head.foldable =>
          d.countCol.map(vc => (vc, (f: AggregateFunction) => f)) // COUNT(*) → SUM(count)
        case Sum(a: AttributeReference, _) => d.sums.get(a.name).map((_, identity[AggregateFunction]))
        case Min(a: AttributeReference) => d.mins.get(a.name).map((_, identity[AggregateFunction]))
        case Max(a: AttributeReference) => d.maxs.get(a.name).map((_, identity[AggregateFunction]))
        case _ => None
      }
    // validate the shape BEFORE paying the view read
    agg.aggregateExpressions.foreach {
      case a: AttributeReference if groupedAttrs.contains(a.exprId) => ()
      case Alias(a: AttributeReference, _) if groupedAttrs.contains(a.exprId) => ()
      case Alias(e, _) if asAgg(e).exists { case (ae, _) =>
          !ae.isDistinct && ae.filter.isEmpty &&
            partialFor(ae.aggregateFunction).isDefined } => ()
      case _ => return None
    }
    if (!d.fresh()) return None

    val viewPlan = d.view().queryExecution.analyzed
    val vAttr: Map[String, Attribute] = viewPlan.output.map(a => a.name -> a).toMap
    // the view must actually carry every column the rewrite needs
    val needed = groupNames ++ filters.flatMap(_.references.map(_.name)) ++
      agg.aggregateExpressions.flatMap {
        case Alias(e, _) =>
          asAgg(e).map { case (ae, _) => partialFor(ae.aggregateFunction).get._1 }
        case _ => None
      }
    if (!needed.forall(vAttr.contains)) return None

    val remapped = filters.map(_.transform {
      case a: AttributeReference => vAttr(a.name)
    })
    val filtered = remapped.foldLeft(viewPlan)((p, c) => Filter(c, p))
    val gExprs: Seq[Expression] = agg.groupingExpressions.map {
      case a: AttributeReference => vAttr(a.name)
    }
    def reAgg(fn: AggregateFunction): Option[Expression] = {
      val col = partialFor(fn).get._1
      val inner: AggregateFunction = fn match {
        case _: Count => Sum(vAttr(col)) // partial counts re-add
        case _: Sum => Sum(vAttr(col))
        case _: Min => Min(vAttr(col))
        case _: Max => Max(vAttr(col))
        case _ => return None
      }
      val rewritten = AggregateExpression(inner, Complete, isDistinct = false,
        filter = None, resultId = NamedExpression.newExprId)
      if (rewritten.dataType == fn.dataType) Some(rewritten)
      else if (typeOk(rewritten.dataType, fn.dataType))
        Some(Cast(rewritten, fn.dataType))
      else None
    }
    val outs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(vAttr(a.name), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case al @ Alias(a: AttributeReference, name) if groupedAttrs.contains(a.exprId) =>
        Alias(vAttr(a.name), name)(exprId = al.exprId, qualifier = al.qualifier)
      case al @ Alias(e, name) =>
        asAgg(e).flatMap { case (ae, wrap) =>
          reAgg(ae.aggregateFunction).map(r =>
            Alias(wrap(r), name)(exprId = al.exprId, qualifier = al.qualifier))
        } match {
          case Some(n) => n
          case None => return None
        }
      case _ => return None // unreachable: validated above
    }
    Some(Aggregate(gExprs, outs, filtered, None))
  }
}

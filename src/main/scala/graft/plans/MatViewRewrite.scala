package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  * maintains (`count_rows`-style COUNT(*), per-column SUM/MIN/MAX,
  * non-null COUNT — the last also serving AVG as SUM(sum)/SUM(count) —
  * and Σx² `sumsqs` partials serving the variance/stddev family, see
  * [[MatViewSupport.momentsOnto]]).
  *
  * The rule rewrites
  *     Aggregate(G, aggs, [Filter f]* [Project attrs]* Scan(base))
  * to
  *     Aggregate(G', aggs', [Filter f']* Scan(view))
  * when:
  *   - the scan's root-path set EQUALS a registration's declared set (a
  *     pruned partial read never rewrites to the full view);
  *   - every grouping expression is a plain view-key column OR a
  *     deterministic expression over view keys (a SUBSET of the keys is
  *     fine, and so is `date_trunc('mon', day)` over a daily-keyed view —
  *     an expression of keys is constant within each view group, so
  *     re-grouping the view by the same expression partitions whole
  *     groups; the rewrite re-aggregates: COUNT→SUM(count_rows),
  *     SUM→SUM(sum), MIN→MIN(min), MAX→MAX(max) are all reassociable);
  *   - every filter references only view-key columns (such filters
  *     commute with the group-by, so they apply verbatim to the view);
  *   - every aggregate is a non-DISTINCT, un-FILTERed COUNT(*) / COUNT(1)
  *     / SUM / MIN / MAX / COUNT(col) / AVG over a maintained column,
  *     with a loss-free result type (identical, or a `Cast.canUpCast`
  *     widening — decimal narrowing refused). AVG — not reassociable itself — rewrites to
  *     SUM(sum)/SUM(count) and is therefore admitted only when its
  *     result type is DOUBLE (integral/float/double inputs): the decimal
  *     family's internal precision bookkeeping differs between Average
  *     and an explicit Divide, and a last-digit rounding drift is exactly
  *     the silent wrongness this rule must never introduce;
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
  * [[MatViewJoinRewrite]] is the N-ary join form of the same idea
  * (aggregate navigation over a maintained star/join view); it shares
  * this file's matching machinery via [[MatViewSupport]].
  *
  * Install session-wide via [[GraftExtensions]] or per-query via
  * `spark.experimental.extraOptimizations`.
  */
object MatView {

  /** One registered materialized view. `baseRoots` returns the EXACT
    * canonicalized root-path set the base's composed scan produces at
    * match time (a thunk, so a registration over a versioned/maintained
    * base follows its commits); the scan must read precisely that set —
    * a pruned partial read must never rewrite to the full view. `view`
    * reads the CURRENT maintained state (invoked at rewrite time);
    * `sums`/`mins`/`maxs`/`counts` map base column name → view partial
    * column (`counts` = per-column NON-NULL counts, serving COUNT(col)
    * and — paired with `sums` — AVG). */
  /** `where`: a FILTERED (partial) view's predicate, as the RESOLVED
    * conjuncts of the filter over the base's schema
    * ([[graft.ops.MatViews.registerRewrite]] resolves the user's Column
    * once at registration). A query navigates onto a filtered view only
    * when its own filter conjuncts CONTAIN every `where` conjunct
    * (matched semantically, attribute names normalized — syntactic
    * subsumption like `x >= 6` for a view's `x > 5` deliberately falls
    * back: sound, not complete); the matched conjuncts are consumed (the
    * view's rows already satisfy them — the filter column need not even
    * be a view column) and only the remainder must pass the key-only
    * commute check. */
  final case class Def(
      name: String,
      baseRoots: () => Set[String],
      view: () => DataFrame,
      keys: Seq[String],
      countCol: Option[String] = None,
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      fresh: () => Boolean = () => true,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      where: () => Seq[Expression] = () => Nil,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty) {
    private[plans] def partials: MatViewSupport.Partials =
      MatViewSupport.Partials(countCol, sums, mins, maxs, counts, kmvs, kmvK,
        sumsqs, sumcubes, sumquads, covs)
  }

  /** A registered view over the N-ary INNER EQUI-JOIN of base tables —
    * the star/chain shape (fact ⋈ dim₁ ⋈ … ⋈ dimₖ) aggregate navigation
    * serves. `roots` gives, per side, the exact scan-root set that side's
    * composed read produces; a matched query's join tree must have
    * exactly one leaf per side (any tree shape / side order). `joinKeys`
    * pair equi-joined columns by GLOBAL name: all referenced column names
    * must be UNAMBIGUOUS across the sides (the view addresses columns by
    * bare name), so an unordered name-pair identifies the edge no matter
    * which side of the query's EqualTo each column appears on. The
    * matched condition conjuncts must be exactly this pair set. */
  /** `where`: a FILTERED star view's post-join predicate, as resolved
    * conjuncts over the joined relation (lazy thunk — see [[Def]]'s
    * `where`); the same consumption/implication rules apply, with
    * join-key IsNotNull guards stripped on both sides (tautological over
    * inner-joined rows). */
  final case class StarDef(
      name: String,
      roots: Seq[() => Set[String]],
      joinKeys: Seq[(String, String)],
      view: () => DataFrame,
      keys: Seq[String],
      countCol: Option[String] = None,
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      counts: Map[String, String] = Map.empty,
      fresh: () => Boolean = () => true,
      where: () => Seq[Expression] = () => Nil,
      derives: Seq[Seq[(String, () => Expression)]] = Nil,
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty) {
    require(roots.size >= 2, s"star view '$name' needs at least two sides")
    private[plans] def partials: MatViewSupport.Partials =
      MatViewSupport.Partials(countCol, sums, mins, maxs, counts, kmvs, kmvK,
        sumsqs, sumcubes, sumquads, covs)
    /** Join edges as canonical key IDS: a stored column by name, a
      * DERIVED key ([[derives]], e.g. the unknown-member synthetic key)
      * by its normalized expression — what the query's condition
      * conjuncts are matched against, independent of the alias names the
      * query chose for its computed keys. Thunked derives resolve lazily
      * (first match attempt), like `where`. */
    private[plans] def pairIdSet: Set[Set[MatViewSupport.JoinKeyId]] = {
      val byName: Map[String, MatViewSupport.JoinKeyId] =
        derives.flatten.map { case (n, e) =>
          n -> (scala.Right(MatViewSupport.normalizeDerived(e())): MatViewSupport.JoinKeyId)
        }.toMap
      joinKeys.map { case (a, b) =>
        Set(byName.getOrElse(a, scala.Left(a): MatViewSupport.JoinKeyId),
          byName.getOrElse(b, scala.Left(b): MatViewSupport.JoinKeyId)) }.toSet
    }
  }

  private val reg = new java.util.concurrent.ConcurrentHashMap[String, Def]
  private val starReg = new java.util.concurrent.ConcurrentHashMap[String, StarDef]

  def register(d: Def): Unit = reg.put(d.name, d)
  def registerStar(d: StarDef): Unit = starReg.put(d.name, d)
  def drop(name: String): Unit = { reg.remove(name); starReg.remove(name) }
  def clear(): Unit = { reg.clear(); starReg.clear() }
  def all: Seq[Def] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.toSeq.sortBy(_.name)
  }
  def allStars: Seq[StarDef] = {
    import scala.jdk.CollectionConverters._
    starReg.values.asScala.toSeq.sortBy(_.name)
  }

  private[plans] def canonical(p: String): String =
    java.nio.file.Paths.get(
      if (p.startsWith("file:")) java.net.URI.create(p).getPath else p
    ).toAbsolutePath.normalize.toString

  /** Canonical root for registration, from a filesystem path. */
  def root(p: java.nio.file.Path): String = canonical(p.toString)
}

/** The matching machinery both rewrite rules share: peeling a scan out
  * from under Filters/pass-through Projects, root-set matching, and the
  * aggregate-shape validation + rebuild that is independent of WHAT was
  * matched underneath (single scan or join). */
private[graft] object MatViewSupport {

  /** Single-threaded per-pass memo (optimizer rules run on one thread). */
  def memo[K, V](f: K => V): K => V = {
    val cache = scala.collection.mutable.HashMap.empty[K, V]
    k => cache.getOrElseUpdate(k, f(k))
  }

  final case class Partials(
      countCol: Option[String],
      sums: Map[String, String],
      mins: Map[String, String],
      maxs: Map[String, String],
      counts: Map[String, String],
      kmvs: Map[String, String] = Map.empty,
      kmvK: Int = 64,
      sumsqs: Map[String, String] = Map.empty,
      sumcubes: Map[String, String] = Map.empty,
      sumquads: Map[String, String] = Map.empty,
      covs: Map[String, (String, String)] = Map.empty)

  /** The six convention-named view columns one `covs` PAIR partial set
    * occupies, from its prefix: pairwise-complete row count, the two
    * sums, the two square sums, and the cross sum — everything the
    * corr/covar family re-expresses from. Shared by registration,
    * maintenance, and serving so the convention can never drift. */
  def covCols(prefix: String): Seq[String] =
    Seq(s"${prefix}_n", s"${prefix}_sx", s"${prefix}_sy",
      s"${prefix}_sxx", s"${prefix}_syy", s"${prefix}_sxy")

  /** A Project passes when every output is a bare column or a SAME-NAMED
    * loss-free upcast of one — the shape the versioned read paths emit to
    * align carried narrow files to the declared schema. A renaming or
    * value-changing projection (including a lossy cast) blocks the
    * rewrite: the view's partials describe the DECLARED columns, and
    * matching is by name. */
  def alignOnly(e: NamedExpression): Boolean = e match {
    case _: AttributeReference => true
    case Alias(a: AttributeReference, n) => n == a.name
    case Alias(c: Cast, n) => c.child match {
      case a: AttributeReference =>
        n == a.name && (c.dataType == a.dataType || Cast.canUpCast(a.dataType, c.dataType))
      case _ => false
    }
    case _ => false
  }

  /** Peel Filters and Projects down to a file-source relation,
    * accumulating filter conditions and tolerating COMPUTED deterministic
    * aliases in the
    * peeled Projects, recording them in a substitution map (alias id →
    * defining expression over the scan, chained derivations resolved) —
    * the shape the analyzer's PullOutGroupingExpressions creates for a
    * GROUP BY over an expression, and what withColumnRenamed leaves for
    * a rename. The caller substitutes the map back into the aggregate and
    * the filters, turning both into expressions over the BASE columns
    * that the view-key checks understand. */
  def stripSubst(p: LogicalPlan, filters: Seq[Expression])
      : Option[(Seq[Expression], LogicalRelation,
          Map[ExprId, Expression])] = p match {
    case Filter(cond, child) => stripSubst(child, filters :+ cond)
    case Project(exprs, child) =>
      stripSubst(child, filters).flatMap { case (f, lr, m) =>
        val extra = Map.newBuilder[ExprId, Expression]
        val ok = exprs.forall {
          case e if alignOnly(e) => true
          case al @ Alias(e, _) if e.deterministic =>
            extra += al.exprId -> e.transform {
              case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
            }
            true
          case _ => false
        }
        if (ok) Some((f, lr, m ++ extra.result())) else None
      }
    case lr: LogicalRelation => Some((filters, lr, Map.empty))
    case _ => None
  }

  def scanRoots(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.map(rp => MatView.canonical(rp.toUri.toString))
    case _ => Seq.empty
  }

  // EXACT set equality: the scan must read precisely the roots the
  // registration declares. Subset reads (a pruned partitioned read, a
  // single-bucket scan) must NOT rewrite to the full view — they
  // aggregate a partial state the view does not represent.
  def covers(roots: Seq[String], expected: Set[String]): Boolean =
    roots.nonEmpty && roots.toSet == expected

  def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }

  // name-normalized canonical form: resolved attribute references become
  // their bare names, so a registration-time resolution of the view's
  // WHERE and a query-time conjunct over the same base schema compare
  // equal regardless of exprIds (both sides saw the same analyzer, so
  // literal promotions and inserted casts line up too)
  private[plans] def nameCanon(e: Expression): Expression =
    e.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
    }.canonicalized

  /** Identity of a join-key slot: a STORED column by bare name, or a
    * DERIVED key (an unknown-member synthetic key, any computed join
    * expression) by its normalized defining expression. */
  type JoinKeyId = Either[String, Expression]

  /** Normalize a derived-key expression for cross-plan comparison: fold
    * constant subtrees (a registration-time analyzed expression must
    * compare equal to the query's optimizer-folded form), strip no-op
    * casts ([[RewriteUnknownMemberJoin]] wraps string keys in
    * string→string casts), unify the single-branch CaseWhen and If forms
    * (`when().otherwise()` builds CaseWhen where the unknown-member rule
    * builds If), then name-canonicalize (exprIds erased). */
  def normalizeDerived(e: Expression): Expression =
    nameCanon(e.transformUp {
      case c: Cast if c.child.dataType == c.dataType => c.child
      case CaseWhen(Seq((p, v)), Some(el)) => If(p, v, el)
      case x if x.foldable && !x.isInstanceOf[Literal] =>
        Literal.create(x.eval(), x.dataType)
    })

  /** The null-guard the optimizer infers for a derived join key and
    * pushes through its computed Project: `isnotnull(K)` distributed over
    * K's conditional branches with literal branches folded — e.g. for the
    * unknown-member dim key `IF(id = -1, SENTINEL, url)` the plan carries
    * `IF(id = -1, true, isnotnull(url))`. Built over a NORMALIZED key
    * expression ([[normalizeDerived]]); compare the result (normalized
    * again) against a query conjunct's normalized form to recognize the
    * guard. Dropping a matched conjunct is sound: every view row came
    * from a matched inner join, whose key was necessarily non-null. */
  def nullGuardOf(e: Expression): Expression = e match {
    case If(p, a, b) => If(p, nullGuardOf(a), nullGuardOf(b))
    case CaseWhen(bs, el) =>
      CaseWhen(bs.map { case (p, v) => (p, nullGuardOf(v)) }, el.map(nullGuardOf))
    case l: Literal => Literal(l.value != null)
    case c: Coalesce if c.children.exists {
        case l: Literal => l.value != null
        case _ => false
      } => Literal(true)
    case x => IsNotNull(x)
  }

  /** A conjunct of the shape `column <cmp> literal` (either operand
    * order), normalized to attribute-left: (column name, op, literal). */
  private def cmpOf(e: Expression): Option[(String, String, Literal)] = e match {
    case GreaterThan(a: AttributeReference, l: Literal) => Some((a.name, ">", l))
    case GreaterThan(l: Literal, a: AttributeReference) => Some((a.name, "<", l))
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => Some((a.name, ">=", l))
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => Some((a.name, "<=", l))
    case LessThan(a: AttributeReference, l: Literal) => Some((a.name, "<", l))
    case LessThan(l: Literal, a: AttributeReference) => Some((a.name, ">", l))
    case LessThanOrEqual(a: AttributeReference, l: Literal) => Some((a.name, "<=", l))
    case LessThanOrEqual(l: Literal, a: AttributeReference) => Some((a.name, ">=", l))
    case EqualTo(a: AttributeReference, l: Literal) => Some((a.name, "=", l))
    case EqualTo(l: Literal, a: AttributeReference) => Some((a.name, "=", l))
    case _ => None
  }

  // types whose interpreted ordering IS SQL comparison: no collations,
  // no nested/interval surprises — anything else falls back
  private def rangeComparable(t: DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | DateType | TimestampType |
           TimestampNTZType | BooleanType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  // does "column = v" (with compare(v, r's literal) = cmp) imply r?
  private def eqImplies(cmp: Int, ro: String): Boolean = ro match {
    case ">" => cmp > 0
    case ">=" => cmp >= 0
    case "<" => cmp < 0
    case "<=" => cmp <= 0
    case "=" => cmp == 0
    case _ => false
  }

  /** An equality-DISJUNCTION shape over one column, as its member-value
    * set: `x = 1`, `x IN (…)`, its optimizer `InSet` form, and raw
    * `x = 1 OR x = 2` trees (any nesting) all normalize here. Literal
    * types must agree across members (the analyzer promotes both sides of
    * genuinely comparable conjuncts identically); null members refuse —
    * sound, not complete. */
  private final case class Members(col: String, dt: DataType, values: Set[Any])
  private def membersOf(e: Expression): Option[Members] = e match {
    case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
      Some(Members(a.name, l.dataType, Set(l.value)))
    case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
      Some(Members(a.name, l.dataType, Set(l.value)))
    case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall {
        case l: Literal => l.value != null
        case _ => false
      } =>
      val ls = vs.map(_.asInstanceOf[Literal])
      if (ls.map(_.dataType).distinct.sizeIs == 1)
        Some(Members(a.name, ls.head.dataType, ls.map(_.value).toSet))
      else None
    case is: InSet => is.child match {
      case a: AttributeReference if is.hset.nonEmpty && !is.hset.contains(null) =>
        Some(Members(a.name, a.dataType, is.hset.toSet))
      case _ => None
    }
    case Or(l, r) =>
      for {
        ml <- membersOf(l); mr <- membersOf(r)
        if ml.col == mr.col && ml.dt == mr.dt
      } yield Members(ml.col, ml.dt, ml.values ++ mr.values)
    case _ => None
  }

  /** The least string strictly greater than EVERY string with prefix `p`
    * under UTF8 binary comparison (Spark's string ordering): increment
    * p's last non-0xFF byte and truncate. `{s : s startsWith p}` is then
    * exactly the half-open range [p, nextPrefix(p)). All-0xFF prefixes
    * have no upper bound → None (only lower-bound implications hold). The
    * result may not be valid UTF-8 — it is only ever an ORDERING probe,
    * never materialized into a plan. */
  private def nextPrefix(p: org.apache.spark.unsafe.types.UTF8String)
      : Option[org.apache.spark.unsafe.types.UTF8String] = {
    val bytes = p.getBytes.clone()
    var i = bytes.length - 1
    while (i >= 0 && bytes(i) == -1) i -= 1 // 0xFF as a signed byte
    if (i < 0) None
    else {
      bytes(i) = (bytes(i) + 1).toByte
      Some(org.apache.spark.unsafe.types.UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, 0, i + 1)))
    }
  }

  /** Does query conjunct `q` IMPLY view conjunct `r`? — single-column
    * analysis over four shape families, any of which may appear on either
    * side: ranges (`column <cmp> literal`: `x > 300` implies `x > 50`,
    * `x >= 6` implies `x > 5`, `x = 7` implies `x >= 7`), equality
    * disjunctions (`=`, IN, InSet, and raw `x = 1 OR x = 2` trees — every
    * member must imply a range `r`; member-SUBSET implies a disjunction
    * `r`), LIKE prefixes (`StartsWith` — a longer prefix implies a
    * shorter one; as a query conjunct against a range `r` it is the
    * half-open string range [p, nextPrefix(p)) under the same UTF8-binary
    * ordering), and the inferred IsNotNull guards every null-rejecting
    * shape implies. Literals must share the column's exact type (the
    * analyzer promoted both sides through the same rules, so they do
    * whenever the conjuncts are genuinely comparable) and be orderable
    * atomics — the interpreted ordering then matches SQL comparison
    * semantics (integrals, decimals, strings, date/timestamp; for
    * float/double the −0.0/0.0 java-vs-SQL edge only produces false
    * NEGATIVES, i.e. a fallback, never a wrong match). Everything
    * unrecognized answers false: sound, not complete. */
  def impliesRange(q: Expression, r: Expression): Boolean = r match {
    // a null-REJECTING query conjunct over the same column implies its
    // inferred isnotnull guard (nullable base columns put one in the
    // view's resolved conjuncts even when the query's own optimization
    // materializes only the range/IN predicate)
    case IsNotNull(ra: AttributeReference) => q match {
      case In(a: AttributeReference, vs) =>
        a.name == ra.name && vs.forall(_.isInstanceOf[Literal])
      case is: InSet => is.child match {
        case a: AttributeReference => a.name == ra.name
        case _ => false
      }
      case StartsWith(a: AttributeReference, l: Literal) =>
        a.name == ra.name && l.value != null
      case _ => cmpOf(q).exists(_._1 == ra.name) ||
        membersOf(q).exists(_.col == ra.name)
    }
    // a PREFIX-sliced view (`url LIKE 'https://en.%'` — the optimizer
    // lowers both sides to StartsWith): implied by a longer prefix, an
    // equality with the prefix, or an equality-disjunction whose every
    // member carries it
    case StartsWith(ra: AttributeReference, rl: Literal) if rl.value != null =>
      val rp = rl.value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      q match {
        case StartsWith(a: AttributeReference, l: Literal) =>
          a.name == ra.name && l.value != null &&
            l.value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
              .startsWith(rp)
        case _ => membersOf(q).exists(m => m.col == ra.name &&
          m.dt == org.apache.spark.sql.types.StringType &&
          m.values.forall(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .startsWith(rp)))
      }
    case _ => impliesCmp(q, r) || impliesSubset(q, r)
  }

  // a view sliced by an equality-disjunction (IN / InSet / OR-of-=):
  // implied by any equality-disjunction query whose members are a subset
  private def impliesSubset(q: Expression, r: Expression): Boolean =
    (for { mr <- membersOf(r); mq <- membersOf(q) }
      yield mq.col == mr.col && mq.dt == mr.dt &&
        mq.values.subsetOf(mr.values)).getOrElse(false)

  private def impliesCmp(q: Expression, r: Expression): Boolean = cmpOf(r) match {
    case Some((rc, ro, rl)) if rl.value != null &&
        rangeComparable(rl.dataType) =>
      lazy val ord = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(rl.dataType)
      q match {
        // LIKE-prefix query conjunct: {s startsWith p} = [p, nextPrefix(p))
        // under the same UTF8-binary ordering string comparison uses
        case StartsWith(a: AttributeReference, l: Literal)
            if a.name == rc && l.value != null &&
              rl.dataType == org.apache.spark.sql.types.StringType =>
          val p = l.value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          ro match {
            case ">" => ord.compare(p, rl.value) > 0
            case ">=" => ord.compare(p, rl.value) >= 0
            // every s < nextPrefix(p) ≤ bound ⇒ s < bound (⇒ s ≤ bound)
            case "<" | "<=" =>
              nextPrefix(p).exists(np => ord.compare(np, rl.value) <= 0)
            case _ => false
          }
        case _ => membersOf(q) match {
          // =, IN, InSet, and raw OR-of-equalities: every member implies
          case Some(m) if m.col == rc && m.dt == rl.dataType =>
            m.values.forall(v => eqImplies(ord.compare(v, rl.value), ro))
          case _ => cmpOf(q) match {
            case Some((qc, qo, ql)) if qc == rc && ql.value != null &&
                ql.dataType == rl.dataType =>
              val cmp = ord.compare(ql.value, rl.value)
              (qo, ro) match {
                case (">", ">") | (">", ">=") | (">=", ">=") => cmp >= 0
                case (">=", ">") => cmp > 0
                case ("=", _) => eqImplies(cmp, ro)
                case ("<", "<") | ("<", "<=") | ("<=", "<=") => cmp <= 0
                case ("<=", "<") => cmp < 0
                case _ => false
              }
            case _ => false
          }
        }
      }
    case _ => false
  }

  /** Consume a filtered view's required conjuncts out of the query's
    * filter set: every `required` conjunct must either match one query
    * conjunct semantically (that conjunct is consumed — the view's rows
    * already satisfy it) or be IMPLIED by one ([[impliesRange]]: a
    * strictly-tighter range over the same column), in which case the
    * implying conjunct is KEPT as a residual — it must then pass the
    * caller's key-only commute check, so a tighter range over a view KEY
    * navigates with the residual re-applied over the view while a tighter
    * range over a measure still falls back (group partials cannot be
    * re-sliced). Returns the remaining query conjuncts, or None when any
    * requirement is unmatched. `required` empty → pass-through. */
  def consumeWhere(filters: Seq[Expression],
      required: Seq[Expression]): Option[Seq[Expression]] = {
    if (required.isEmpty) return Some(filters)
    var remaining = filters.flatMap(conjunctsOf).map(q => (q, nameCanon(q)))
    required.foreach { r =>
      val rc = nameCanon(r)
      val i = remaining.indexWhere(_._2 == rc)
      if (i >= 0) remaining = remaining.patch(i, Nil, 1)
      else if (!remaining.exists { case (q, _) => impliesRange(q, r) })
        return None
    }
    // the optimizer infers IsNotNull guards from the query's own filter
    // (x > 100 ⇒ isnotnull(x)); once the implying conjunct is consumed,
    // such a guard over a consumed conjunct's column is tautological for
    // every row the view aggregated — drop it rather than let a non-key
    // reference block the rewrite
    val requiredRefs = required.flatMap(_.references.map(_.name)).toSet
    Some(remaining.map(_._1).filterNot {
      case IsNotNull(a: AttributeReference) => requiredRefs.contains(a.name)
      case _ => false
    })
  }

  // a rewritten aggregate's result must be byte-identical or a loss-free
  // upcast of the original's — otherwise no rewrite. Cast.canUpCast is
  // the exact "no precision loss, no overflow" relation (it refuses
  // decimal narrowing and the long→double family), so the guard matches
  // its contract instead of admitting any numeric→numeric cast.
  def typeOk(from: DataType, to: DataType): Boolean =
    from == to || Cast.canUpCast(from, to)

  /** Every view column name an output expression's aggregates read:
    * partial columns for partial-served functions, the KEY column itself
    * for key-exact distinct/HLL aggregates, the sketch partial for
    * KMV-served ones. Call only on validated expressions (partialsFor is
    * non-empty for every partial-served aggregate). */
  def neededBy(e: Expression, partials: Partials, keys: Set[String]): Seq[String] =
    e.collect {
      case ae: AggregateExpression =>
        if (ae.isDistinct) ae.references.toSeq.flatMap(r =>
          if (keys.contains(r.name)) Seq(r.name)
          else partials.kmvs.get(r.name).toSeq)
        else (ae.aggregateFunction match {
          case hll: HyperLogLogPlusPlus => hll.references.map(_.name).toSeq
          case ks: graft.plans.KmvSketch =>
            ks.references.toSeq.flatMap(r => partials.kmvs.get(r.name).toSeq)
          // exact percentile over a distribution view: the measure IS a
          // view key; count_rows becomes the frequency (validated servable)
          case pc: Percentile =>
            pc.child.references.map(_.name).toSeq ++ partials.countCol.toSeq
          case fn => partialsFor(partials, fn).get
        }) ++ ae.filter.toSeq.flatMap(_.references.map(_.name)) // FILTER keys
    }.flatten

  /** The view partial column(s) an aggregate re-aggregates from, or None
    * when the view cannot serve it. AVG needs BOTH a sum and a non-null
    * count partial and is gated to the DOUBLE result family (see
    * [[MatViewRewrite]]'s doc — decimal Average's precision bookkeeping
    * is not reproduced by an explicit Divide, so decimals fall back to
    * the base scan). */
  def partialsFor(d: Partials, fn: AggregateFunction): Option[Seq[String]] =
    fn match {
      case c: Count if c.children.size == 1 && c.children.head.foldable =>
        d.countCol.map(Seq(_)) // COUNT(*) / COUNT(1) → SUM(count_rows)
      case Count(Seq(a: AttributeReference)) =>
        d.counts.get(a.name).map(Seq(_)) // COUNT(x) → SUM(count_x)
      // two-column COUNT — the regr_count lowering — counts rows where
      // BOTH are non-null: exactly a registered pair's n partial
      case Count(Seq(a: AttributeReference, b: AttributeReference)) =>
        d.covs.collectFirst {
          case (p, (x, y)) if Set(x, y) == Set(a.name, b.name) =>
            Seq(covCols(p).head)
        }
      case Sum(a: AttributeReference, _) => d.sums.get(a.name).map(Seq(_))
      case Min(a: AttributeReference) => d.mins.get(a.name).map(Seq(_))
      case Max(a: AttributeReference) => d.maxs.get(a.name).map(Seq(_))
      case avg @ Average(a: AttributeReference, _)
          if avg.dataType == DoubleType =>
        for { s <- d.sums.get(a.name); c <- d.counts.get(a.name) }
          yield Seq(s, c)
      // PAIRWISE-GATED average — the regr_avgx/regr_avgy lowering
      // (avg over `If(both non-null, v, null)`): the pair's (Σv, n)
      // serve it through the ordinary AVG rewrite
      case avg: Average if avg.dataType == DoubleType =>
        gatedTarget(avg.child).flatMap { case (gate, v) =>
          d.covs.collectFirst {
            case (p, (a, b)) if Set(a, b) == gate && v == a =>
              val cc = covCols(p); Seq(cc(1), cc.head)
            case (p, (a, b)) if Set(a, b) == gate && v == b =>
              val cc = covCols(p); Seq(cc(2), cc.head)
          }
        }
      // the regr_sxx/regr_syy lowering: a central-moment M2 over the
      // pairwise-gated value — (n, Σv, Σv²) in the value's pair role
      case rr: RegrReplacement =>
        gatedTarget(rr.child).flatMap { case (gate, v) =>
          d.covs.collectFirst {
            case (p, (a, b)) if Set(a, b) == gate && v == a =>
              val cc = covCols(p); Seq(cc.head, cc(1), cc(3))
            case (p, (a, b)) if Set(a, b) == gate && v == b =>
              val cc = covCols(p); Seq(cc.head, cc(2), cc(4))
          }
        }
      // the regression family proper: role-ordered six
      // (n, Σx, Σy, Σx², Σy², Σxy) with x = the INDEPENDENT (right)
      // argument — regr_* is not argument-symmetric. Precedes the
      // Covariance case below: RegrSXY subclasses Covariance. (regr_sxx/
      // regr_syy never arrive as their own classes — ReplaceExpressions
      // lowers them to RegrReplacement, handled above — while RegrSXY
      // survives the optimizer as itself; verified against Spark 4.1.2.)
      case r @ (_: RegrSlope | _: RegrIntercept | _: RegrR2 | _: RegrSXY) =>
        val (dep, indep) = r match {
          case f: RegrSlope => (f.left, f.right)
          case f: RegrIntercept => (f.left, f.right)
          case f: RegrR2 => (f.left, f.right)
          case f: RegrSXY => (f.left, f.right)
        }
        for {
          yn <- varianceTarget(dep); xn <- varianceTarget(indep)
          cols <- d.covs.collectFirst {
            case (p, (a, b)) if a == xn && b == yn => covCols(p)
            case (p, (a, b)) if a == yn && b == xn =>
              val Seq(n, sa, sb, saa, sbb, sab) = covCols(p)
              Seq(n, sb, sa, sbb, saa, sab)
          }
        } yield cols
      // the variance/stddev family re-expresses over the (Σx², Σx, n)
      // triple — sumsq + sum + non-null count partials of the same column.
      // The analyzer casts any non-double child to DOUBLE (the family's
      // input type), so the measure column sits either bare or under that
      // inserted cast; both denote the same base column.
      case fn @ (_: VarianceSamp | _: VariancePop | _: StddevSamp |
                 _: StddevPop) =>
        varianceTarget(fn.asInstanceOf[CentralMomentAgg].child).flatMap { n =>
          for { q <- d.sumsqs.get(n); s <- d.sums.get(n); c <- d.counts.get(n) }
            yield Seq(q, s, c)
        }
      // the higher central moments ride the same power-sum machinery:
      // skewness from (Σx³, Σx², Σx, n), kurtosis additionally from Σx⁴
      case fn: Skewness =>
        varianceTarget(fn.child).flatMap { n =>
          for { u <- d.sumcubes.get(n); q <- d.sumsqs.get(n)
                s <- d.sums.get(n); c <- d.counts.get(n) }
            yield Seq(u, q, s, c)
        }
      case fn: Kurtosis =>
        varianceTarget(fn.child).flatMap { n =>
          for { w <- d.sumquads.get(n); u <- d.sumcubes.get(n)
                q <- d.sumsqs.get(n); s <- d.sums.get(n)
                c <- d.counts.get(n) }
            yield Seq(w, u, q, s, c)
        }
      // the cross-moment family (corr / covar_pop / covar_samp) serves
      // from a registered PAIR's six pairwise-complete partials. All
      // three formulas are symmetric in (x, y) — ck and the corr
      // denominator are invariant under the swap — so a query naming the
      // pair in either order matches the same registration.
      case fn @ (_: Covariance | _: PearsonCorrelation) =>
        val (l, r) = fn match {
          case c: Covariance => (c.left, c.right)
          case c: PearsonCorrelation => (c.left, c.right)
        }
        for {
          xn <- varianceTarget(l); yn <- varianceTarget(r)
          p <- d.covs.collectFirst {
            case (p0, (a, b)) if (a == xn && b == yn) ||
              (a == yn && b == xn) => p0
          }
        } yield covCols(p)
      case _ => None
    }

  /** A PAIRWISE-GATED measure — the shape the regr_* lowerings produce:
    * `If(isnotnull(a) AND isnotnull(b), v, null)` (the analyzer's form)
    * or `If(isnull(a) OR isnull(b), null, v)` (the optimizer's), with v
    * one of the gate columns, possibly under the inserted cast-to-double.
    * Returns (gate column set, measured column). */
  private def gatedTarget(e: Expression): Option[(Set[String], String)] = {
    val inner = e match {
      case c: Cast if c.dataType == DoubleType => c.child
      case x => x
    }
    inner match {
      case If(And(IsNotNull(a: AttributeReference),
          IsNotNull(b: AttributeReference)), v, Literal(null, _)) =>
        varianceTarget(v).map((Set(a.name, b.name), _))
      case If(Or(IsNull(a: AttributeReference),
          IsNull(b: AttributeReference)), Literal(null, _), v) =>
        varianceTarget(v).map((Set(a.name, b.name), _))
      case _ => None
    }
  }

  /** The base column a variance-family aggregate measures: its child is
    * the bare attribute (double input) or the analyzer's inserted
    * cast-to-double of one (any other numeric input). */
  private def varianceTarget(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case c: Cast if c.dataType == DoubleType => c.child match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    case _ => None
  }

  /** Serve a cross-moment family leaf — `corr` / `covar_pop` /
    * `covar_samp` — from a pair's six pairwise-complete partials
    * `Seq(n, Σx, Σy, Σx², Σy², Σxy)` (all restricted to rows where BOTH
    * inputs are non-null, exactly the rows Spark's Covariance/
    * PearsonCorrelation update consumes):
    *     ck  = Σxy − ΣxΣy/n
    *     xMk = Σx² − (Σx)²/n,  yMk = Σy² − (Σy)²/n
    *     covar_pop = ck/n;  covar_samp = ck/(n−1);
    *     corr = ck/√(xMk·yMk)
    * n = 0 answers NULL and the n = 1 sampled edges answer the
    * function's own divide-by-zero result, mirroring the base classes.
    * corr's denominator is deliberately NOT guarded and its division
    * uses the SESSION eval mode: Spark's own Corr divides unguarded, so
    * a constant-column corr THROWS under ANSI and answers NULL under
    * legacy — the rewrite must reproduce exactly that, not soften it.
    * xMk/yMk stay unclamped for the same reason (a clamped exact 0 would
    * manufacture an ANSI error the base only raises when Welford's xMk
    * is exactly 0 — i.e. a truly constant column, where the power-sum
    * form is exactly 0 too for the integer-valued measures the partials
    * keep exact). */
  def covarianceOnto(fn: AggregateFunction, attrs: Seq[Attribute],
      complete: AggregateFunction => AggregateExpression): Option[Expression] = {
    import org.apache.spark.sql.types.LongType
    val Seq(nA, sxA, syA, sxxA, syyA, sxyA) = attrs
    if (nA.dataType != LongType) return None
    if (Seq(sxA, syA, sxxA, syyA, sxyA).exists(_.dataType != DoubleType))
      return None
    val (guardOne, corrForm, nullOnDiv) = fn match {
      case f: CovSample => (true, false, f.nullOnDivideByZero)
      case f: CovPopulation => (false, false, f.nullOnDivideByZero)
      case f: Corr => (true, true, f.nullOnDivideByZero)
      case _ => return None
    }
    // session-mode arithmetic (no explicit evalMode): only corr's
    // denominator can reach a zero divisor, and there the base plan's
    // behavior IS mode-dependent — reproduce it
    val n = Cast(complete(Sum(nA)), DoubleType)
    val sx: Expression = complete(Sum(sxA))
    val sy: Expression = complete(Sum(syA))
    val ck = Subtract(complete(Sum(sxyA)), Divide(Multiply(sx, sy), n))
    val body: Expression =
      if (!corrForm) {
        val divisor = if (guardOne) Subtract(n, Literal(1.0)) else n
        Divide(ck, divisor)
      } else {
        val xMk = Subtract(complete(Sum(sxxA)), Divide(Multiply(sx, sx), n))
        val yMk = Subtract(complete(Sum(syyA)), Divide(Multiply(sy, sy), n))
        Divide(ck, Sqrt(Multiply(xMk, yMk)))
      }
    val nullD = Literal.create(null, DoubleType)
    val atOne = if (nullOnDiv) nullD else Literal(Double.NaN)
    // NULL n (re-aggregated nothing) answers NULL like n = 0 — here the
    // unclamped moments would propagate the NULL anyway, but the explicit
    // arm keeps the family uniform with momentsOnto/regrOnto
    Some(If(Or(IsNull(n), EqualTo(n, Literal(0.0))), nullD,
      if (guardOne) If(EqualTo(n, Literal(1.0)), atOne, body) else body))
  }

  /** Serve the linear-regression family from a pair's partials. Edge
    * semantics pinned against Spark 4.1 behavior (probed empirically —
    * all guarded to NULL, no ANSI-throw paths):
    *   regr_sxx/syy ([[RegrReplacement]] with attrs (n, Σv, Σv²)):
    *     n = 0 → NULL, else vMk (0.0 for a constant column);
    *   regr_sxy: n = 0 → NULL, else ck;
    *   regr_slope: n = 0 ∨ xMk = 0 → NULL, else ck/xMk;
    *   regr_intercept: n = 0 ∨ xMk = 0 → NULL, else ȳ − slope·x̄;
    *   regr_r2: n = 0 ∨ xMk = 0 → NULL; yMk = 0 → 1.0;
    *     else ck²/(xMk·yMk).
    * Six-attr families take role-ordered (n, Σx, Σy, Σx², Σy², Σxy)
    * with x = the independent argument. Even moments clamp at 0 (the
    * Welford invariant), so the m2 = 0 null-guards fire exactly where
    * the base plan's do for the exact-partial regime. */
  def regrOnto(fn: AggregateFunction, attrs: Seq[Attribute],
      complete: AggregateFunction => AggregateExpression): Option[Expression] = {
    import org.apache.spark.sql.types.LongType
    if (attrs.head.dataType != LongType) return None
    if (attrs.tail.exists(_.dataType != DoubleType)) return None
    def dv(a: Expression, b: Expression) = Divide(a, b, EvalMode.LEGACY)
    def ml(a: Expression, b: Expression) = Multiply(a, b, EvalMode.LEGACY)
    def sb(a: Expression, b: Expression) = Subtract(a, b, EvalMode.LEGACY)
    val n = Cast(complete(Sum(attrs.head)), DoubleType)
    def m2Of(sv: Expression, svv: Expression): Expression =
      Greatest(Seq(sb(svv, dv(ml(sv, sv), n)), Literal(0.0)))
    val nullD = Literal.create(null, DoubleType)
    // empty arm: n is 0 for a group with no complete pairs and NULL for
    // the re-aggregated-nothing cases (global over an empty view, FILTER
    // excluding every row) — both answer NULL, and the guard MUST catch
    // the NULL before the clamped m2 (greatest(NULL, 0) is 0) turns an
    // empty group into a spurious 0.0/constant-column answer
    val nEmpty = Or(IsNull(n), EqualTo(n, Literal(0.0)))
    fn match {
      case _: RegrReplacement =>
        val Seq(_, svA, svvA) = attrs
        Some(If(nEmpty, nullD,
          m2Of(complete(Sum(svA)), complete(Sum(svvA)))))
      // RegrSXX/RegrSYY never reach this rule: the optimizer's
      // ReplaceExpressions lowers them to RegrReplacement first (RegrSXY,
      // oddly, survives as itself — verified against Spark 4.1.2)
      case _: RegrSXY | _: RegrSlope | _: RegrIntercept | _: RegrR2 =>
        val Seq(_, sxA, syA, sxxA, syyA, sxyA) = attrs
        val sx: Expression = complete(Sum(sxA))
        val sy: Expression = complete(Sum(syA))
        lazy val ck = sb(complete(Sum(sxyA)), dv(ml(sx, sy), n))
        lazy val xMk = m2Of(sx, complete(Sum(sxxA)))
        lazy val yMk = m2Of(sy, complete(Sum(syyA)))
        lazy val guard = Or(nEmpty, EqualTo(xMk, Literal(0.0)))
        fn match {
          case _: RegrSXY => Some(If(nEmpty, nullD, ck))
          case _: RegrSlope => Some(If(guard, nullD, dv(ck, xMk)))
          case _: RegrIntercept => Some(If(guard, nullD,
            sb(dv(sy, n), ml(dv(ck, xMk), dv(sx, n)))))
          case _: RegrR2 => Some(If(guard, nullD,
            If(EqualTo(yMk, Literal(0.0)), Literal(1.0),
              dv(ml(ck, ck), ml(xMk, yMk)))))
          case _ => None
        }
      case _ => None
    }
  }

  /** Serve a central-moment family leaf from its resolved power-sum
    * partial attributes — the textbook re-expression of the central sums
    * from signed power sums (μ = Σx/n):
    *     M2 = Σx² − (Σx)²/n
    *     M3 = Σx³ − 3μΣx² + 2μ²Σx
    *     M4 = Σx⁴ − 4μΣx³ + 6μ²Σx² − 3μ³Σx
    * with Spark's exact edge semantics mirrored from
    * CentralMomentAgg.getStatistic: n = 0 — or NULL, the re-aggregated
    * empty case (global aggregate over an empty view, a FILTER clause
    * excluding every row) — answers NULL; the sampled variance/stddev
    * variants answer their divide-by-zero result at n = 1, and
    * skewness/kurtosis answer it at M2 = 0 (NULL under the default
    * non-legacy conf, NaN under legacy — read from the matched
    * function's own `nullOnDivideByZero`, so the rewrite follows whatever
    * the session resolved). M2 and M4 are clamped at 0 against downward
    * float cancellation — both are sums of even powers of deviations, ≥ 0
    * by construction, so the clamp restores the invariant rather than
    * changing a result (and NaN inputs still propagate: greatest treats
    * NaN as the largest double, exactly the poisoning the base plan has);
    * M3 is legitimately signed and stays unclamped. The NULL-n arm of the
    * guard matters precisely because of those clamps: greatest(NULL, 0)
    * is 0, so an unguarded NULL n would otherwise fall into the M2 = 0
    * divide-by-zero branch instead of the base plan's NULL.
    *
    * `attrs` by function: variance/stddev → Seq(Σx², Σx, n); Skewness →
    * Seq(Σx³, Σx², Σx, n); Kurtosis → Seq(Σx⁴, Σx³, Σx², Σx, n).
    *
    * Double-domain stance (same envelope as the SUM/AVG family over
    * doubles): the re-expressed value may differ from one particular base
    * scan's in the last ULPs, because float aggregation is
    * order-sensitive — but so is Spark's own CentralMomentAgg across
    * partitionings; there is no single canonical bit pattern to preserve.
    * Decimal measures fall back (their Σx partial is decimal — refused
    * below), the same stance as AVG. */
  def momentsOnto(fn: AggregateFunction, attrs: Seq[Attribute],
      complete: AggregateFunction => AggregateExpression): Option[Expression] = {
    import org.apache.spark.sql.types.LongType
    // attrs tail-aligned: (…higher powers…, Σx², Σx, n)
    val (cntA, sxA, sqA) = (attrs.last, attrs(attrs.size - 2), attrs(attrs.size - 3))
    // partial types must be what the maintenance paths write: power sums
    // double, Σx double or long (sum over double/float is double; over
    // integrals, long — exact in double within 2^53, the same per-value
    // cast error envelope the base plan's cast-to-double child has),
    // n long. A decimal Σx (decimal measure) refuses — fall back.
    if (attrs.dropRight(2).exists(_.dataType != DoubleType)) return None
    if (sxA.dataType != DoubleType && sxA.dataType != LongType) return None
    if (cntA.dataType != LongType) return None
    val nullOnDiv = fn match {
      case f: VarianceSamp => f.nullOnDivideByZero
      case f: VariancePop => f.nullOnDivideByZero
      case f: StddevSamp => f.nullOnDivideByZero
      case f: StddevPop => f.nullOnDivideByZero
      case f: Skewness => f.nullOnDivideByZero
      case f: Kurtosis => f.nullOnDivideByZero
      case _ => return None
    }
    def dv(a: Expression, b: Expression) = Divide(a, b, EvalMode.LEGACY)
    def ml(a: Expression, b: Expression) = Multiply(a, b, EvalMode.LEGACY)
    def sb(a: Expression, b: Expression) = Subtract(a, b, EvalMode.LEGACY)
    def ad(a: Expression, b: Expression) = Add(a, b, EvalMode.LEGACY)
    val sq: Expression = complete(Sum(sqA))
    val sx: Expression = Cast(complete(Sum(sxA)), DoubleType)
    val n: Expression = Cast(complete(Sum(cntA)), DoubleType)
    lazy val mu = dv(sx, n)
    val m2 = Greatest(Seq(sb(sq, dv(ml(sx, sx), n)), Literal(0.0)))
    val nullD = Literal.create(null, DoubleType)
    val divByZero = if (nullOnDiv) nullD else Literal(Double.NaN)
    // empty arm: n is 0 for a group with no non-null values and NULL for
    // the re-aggregated-nothing cases (global over an empty view, FILTER
    // excluding every row) — BOTH must answer NULL before any
    // divide-by-zero branch can fire (greatest(NULL, 0) is 0, so an
    // unguarded NULL n would land in the M2 = 0 branch)
    val nEmpty = Or(IsNull(n), EqualTo(n, Literal(0.0)))
    // guard(cond is the function's divide-by-zero condition)
    def guarded(cond: Expression, body: Expression): Expression =
      If(nEmpty, nullD, If(cond, divByZero, body))
    val atOne = EqualTo(n, Literal(1.0))
    val m2Zero = EqualTo(m2, Literal(0.0))
    val body: Expression = fn match {
      case _: VarianceSamp =>
        return Some(guarded(atOne, dv(m2, sb(n, Literal(1.0)))))
      case _: StddevSamp =>
        return Some(guarded(atOne, Sqrt(dv(m2, sb(n, Literal(1.0))))))
      case _: VariancePop =>
        return Some(If(nEmpty, nullD, dv(m2, n)))
      case _: StddevPop =>
        return Some(If(nEmpty, nullD, Sqrt(dv(m2, n))))
      case _: Skewness =>
        val cube: Expression = complete(Sum(attrs.head))
        val m3 = ad(sb(cube, ml(ml(Literal(3.0), mu), sq)),
          ml(ml(Literal(2.0), ml(mu, mu)), sx))
        dv(ml(Sqrt(n), m3), Sqrt(ml(m2, ml(m2, m2))))
      case _: Kurtosis =>
        val Seq(quadA, cubeA, _, _, _) = attrs
        val quad: Expression = complete(Sum(quadA))
        val cube: Expression = complete(Sum(cubeA))
        val m4 = Greatest(Seq(
          sb(ad(sb(quad, ml(ml(Literal(4.0), mu), cube)),
              ml(ml(Literal(6.0), ml(mu, mu)), sq)),
            ml(ml(Literal(3.0), ml(mu, ml(mu, mu))), sx)),
          Literal(0.0)))
        sb(dv(ml(n, m4), ml(m2, m2)), Literal(3.0))
      case _ => return None
    }
    Some(guarded(m2Zero, body))
  }

  /** Validate the aggregate's SHAPE against the registration and rebuild
    * it over the view — everything downstream of having matched the
    * source (scan roots for [[MatViewRewrite]], roots + join condition
    * for [[MatViewJoinRewrite]]). `filters` are the accumulated
    * conditions peeled off on the way to the source; `fresh` and `view`
    * are only invoked once the shape is known to match. */
  def rebuildOntoView(
      agg: Aggregate,
      filters: Seq[Expression],
      keys: Seq[String],
      partials: Partials,
      fresh: () => Boolean,
      view: () => DataFrame,
      approxDistinct: Boolean = false): Option[LogicalPlan] = {
    val keySet = keys.toSet
    // grouping: each expression is a plain view-key column, or a
    // DETERMINISTIC expression over view keys — date_trunc('mon', day),
    // CASE over a key, concat of keys: the month-rollup-over-a-daily-view
    // shape. An expression of keys is CONSTANT within each view group, so
    // re-grouping the view by the same expression partitions whole
    // groups and partial re-aggregation stays exact.
    val groupOk = agg.groupingExpressions.forall {
      case a: AttributeReference => keySet.contains(a.name)
      case e => e.deterministic && e.references.nonEmpty &&
        e.references.forall(a => keySet.contains(a.name))
    }
    if (!groupOk) return None
    val groupRefNames = agg.groupingExpressions.flatMap(_.references.map(_.name))
    // filters: only view-key columns (commute with the group-by), and
    // DETERMINISTIC — a reference-free rand() < 0.5 would pass the key
    // check vacuously, yet re-applying it over the view turns row-level
    // sampling into group-level sampling (different COUNT/SUM answers)
    if (!filters.forall(f => f.deterministic &&
        f.references.forall(a => keySet.contains(a.name))))
      return None
    // every output is either a grouping column or an expression tree whose
    // aggregate leaves are all servable, whose attribute leaves are
    // grouping columns, and whose interior nodes are deterministic —
    // ratio-of-aggregates (SUM(a)/SUM(b)), measure arithmetic, and CASE
    // over keys are all exactly rewritable when each aggregate leaf is.
    // Servable leaves: the partial-backed COUNT/SUM/MIN/MAX/AVG family,
    // plus the KEY-EXACT distinct family — COUNT(DISTINCT k) and
    // approx_count_distinct(k) for a view KEY column k are exact over the
    // view, because its key columns hold precisely the distinct
    // (group, k) combinations the base does (HLL++ is duplicate-
    // insensitive, so even the approximate answer is bit-identical).
    val groupedAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference => a.exprId }.toSet
    // the whole DISTINCT family is exact over view KEYS: the view's rows
    // carry precisely the distinct (group, keys…) combinations the base
    // does, so any deterministic distinct aggregate whose references are
    // all key columns — COUNT/SUM/AVG(DISTINCT …), multi-column,
    // expressions over keys — computes the identical value over the view
    // (Percentile joins the family: DISTINCT dedups its input tuples, and
    // the view's key rows are exactly that distinct set)
    def distinctOverKeys(ae: AggregateExpression): Boolean = {
      val refs = ae.aggregateFunction.references.toSeq
      refs.nonEmpty && refs.forall(r => keySet.contains(r.name)) &&
        ae.aggregateFunction.deterministic &&
        (ae.aggregateFunction match {
          case _: Count | _: Sum | _: Average | _: Percentile => true
          case _ => false
        })
    }
    // EXACT median/percentile navigation over a DISTRIBUTION view — one
    // keyed by (group keys…, measure): each view row is a distinct
    // (group, value) pair and count_rows its multiplicity, so
    // Percentile(measure, p) over the base re-expresses EXACTLY as
    // Percentile(measure, p, frequency = count_rows) over the view
    // (Spark's own frequency semantics: each value counted freq times —
    // the identical expanded multiset, identical interpolation). Admits
    // only the un-weighted query form (frequency = 1 literal): a query
    // that already carries a frequency column has per-row weights the
    // view cannot reproduce. Median and percentile_cont land here too —
    // the optimizer's ReplaceExpressions lowers both to Percentile before
    // this rule runs.
    def percentileOverKey(pc: Percentile): Boolean =
      (pc.child match {
        case a: AttributeReference => keySet.contains(a.name)
        case _ => false
      }) && pc.percentageExpression.foldable &&
        (pc.frequencyExpression match {
          // the un-weighted query forms: an explicit 1 literal in either
          // type the surfaces produce (percentile() analyzes to an Int
          // literal, median()/percentile_cont() lower to a Long one)
          case Literal(1L, org.apache.spark.sql.types.LongType) => true
          case Literal(1, org.apache.spark.sql.types.IntegerType) => true
          case _ => false
        }) && partials.countCol.isDefined
    // a FILTER (WHERE …) clause over view KEYS is admissible on EVERY
    // served family: a key-only predicate partitions WHOLE groups (it is
    // constant within each), so filtering the view's rows selects exactly
    // the base rows the query's filter selects — partial re-aggregation,
    // key-exact distinct, sketch merges, and frequency percentiles all
    // stay exact with the remapped filter attached. Non-deterministic or
    // non-key filters fall back.
    def filterOverKeys(ae: AggregateExpression): Boolean = ae.filter.forall(
      f => f.deterministic && f.references.forall(a => keySet.contains(a.name)))
    def servable(ae: AggregateExpression): Boolean =
      filterOverKeys(ae) && (
        if (ae.isDistinct) distinctOverKeys(ae) || (ae.aggregateFunction match {
          case Count(Seq(a: AttributeReference)) =>
            // OPT-IN approximate navigation: COUNT(DISTINCT x) over a
            // maintained KMV sketch partial — the ONE rewrite in this
            // rule that changes results (to the sketch's estimate), so
            // it is gated on an explicit session conf, never the default
            approxDistinct && partials.kmvs.contains(a.name)
          case _ => false
        }) else ae.aggregateFunction match {
          case hll: HyperLogLogPlusPlus => hll.child match {
            case a: AttributeReference => keySet.contains(a.name)
            case _ => false
          }
          case ks: graft.plans.KmvSketch => ks.child match {
            // a query's own KMV estimate navigates EXACTLY: union of
            // k-min sets trimmed to k is the k-min set of the union
            case a: AttributeReference =>
              partials.kmvs.contains(a.name) && ks.k == partials.kmvK
            case _ => false
          }
          case pc: Percentile => percentileOverKey(pc)
          case fn => partialsFor(partials, fn).isDefined
        })
    // an output subtree that IS one of the grouping expressions (the
    // expression-grouping shape: Alias(date_trunc(…), "month")) passes
    // whole — its key refs remap to the view and the SAME expression
    // re-evaluates per re-grouped view row
    def isGroupExpr(e: Expression): Boolean =
      agg.groupingExpressions.exists(_.semanticEquals(e))
    def exprOk(e: Expression): Boolean = e match {
      case ae: AggregateExpression => servable(ae)
      case e if isGroupExpr(e) => true
      case a: AttributeReference => groupedAttrs.contains(a.exprId)
      case _: Literal => true
      case o => o.deterministic && o.children.nonEmpty && o.children.forall(exprOk)
    }
    agg.aggregateExpressions.foreach {
      case a: AttributeReference if groupedAttrs.contains(a.exprId) => ()
      case Alias(e, _) if exprOk(e) => ()
      case _ => return None
    }
    if (!fresh()) return None

    val viewPlan = view().queryExecution.analyzed
    val vAttr: Map[String, Attribute] = viewPlan.output.map(a => a.name -> a).toMap
    // the view must actually carry every column the rewrite needs
    val needed = groupRefNames ++ filters.flatMap(_.references.map(_.name)) ++
      agg.aggregateExpressions.flatMap {
        case Alias(e, _) => neededBy(e, partials, keySet)
        case _ => Nil
      }
    if (!needed.forall(vAttr.contains)) return None
    // key column types must equal the view's (mirrors the rollup path's
    // guard): with a mis-registered view the rewritten Aggregate would
    // rebind preserved exprIds to attributes of a DIFFERENT dataType —
    // an invalid or silently wrong plan instead of a base fallback. The
    // key-exact distinct aggregates read key columns too — same rule.
    val keyRefs = agg.groupingExpressions.flatMap(_.references.collect {
      case a: AttributeReference => a }) ++
      filters.flatMap(_.references.collect { case a: AttributeReference => a }) ++
      agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression =>
          ae.references.filter(r => keySet.contains(r.name)).toSeq
      }.flatten)
    if (!keyRefs.forall(a =>
        vAttr.get(a.name).exists(_.dataType == a.dataType))) return None

    val remapped = filters.map(_.transform {
      case a: AttributeReference => vAttr(a.name)
    })
    val filtered = remapped.foldLeft(viewPlan)((p, c) => Filter(c, p))
    val gExprs: Seq[Expression] = agg.groupingExpressions.map(_.transform {
      case a: AttributeReference => vAttr(a.name)
    })
    // a GLOBAL aggregate (no GROUP BY) always emits one row, even over an
    // empty view scan (empty base, or a key filter matching no groups) —
    // and SUM over zero rows is NULL where COUNT must answer 0
    val globalAgg = agg.groupingExpressions.isEmpty
    def reAgg(fn: AggregateFunction, filt: Option[Expression]): Option[Expression] = {
      def complete(f: AggregateFunction): AggregateExpression =
        AggregateExpression(f, Complete, isDistinct = false,
          filter = filt, resultId = NamedExpression.newExprId)
      val cols = partialsFor(partials, fn).get
      val rewritten: Expression = fn match {
        case _: Count => // partial counts re-add
          val s = complete(Sum(vAttr(cols.head)))
          if (globalAgg || filt.isDefined) Coalesce(Seq(s, Literal(0L))) else s
        case _: Sum => complete(Sum(vAttr(cols.head)))
        case _: Min => complete(Min(vAttr(cols.head)))
        case _: Max => complete(Max(vAttr(cols.head)))
        case _: Average =>
          // AVG(x) = SUM(sum_x) / SUM(count_x) — double family only
          // (validated in partialsFor). LEGACY divide: a 0 count can only
          // pair with a NULL sum (no non-null values anywhere), and
          // null/0 must stay NULL, exactly Average's all-null answer.
          val Seq(s, c) = cols
          Divide(Cast(complete(Sum(vAttr(s))), DoubleType),
            Cast(complete(Sum(vAttr(c))), DoubleType), EvalMode.LEGACY)
        case _: VarianceSamp | _: VariancePop | _: StddevSamp |
             _: StddevPop | _: Skewness | _: Kurtosis =>
          // the power-sum partials serve the whole central-moment family
          // — see momentsOnto for the formulas and double-domain stance
          momentsOnto(fn, cols.map(vAttr), complete) match {
            case Some(e) => e
            case None => return None
          }
        // regr before Covariance: RegrSXY subclasses Covariance
        case _: RegrReplacement | _: RegrSXY | _: RegrSlope |
             _: RegrIntercept | _: RegrR2 =>
          // the pair partials serve the regression family
          regrOnto(fn, cols.map(vAttr), complete) match {
            case Some(e) => e
            case None => return None
          }
        case _: Covariance | _: PearsonCorrelation =>
          // the pair partials serve the cross-moment family
          covarianceOnto(fn, cols.map(vAttr), complete) match {
            case Some(e) => e
            case None => return None
          }
        case _ => return None
      }
      if (rewritten.dataType == fn.dataType) Some(rewritten)
      else if (typeOk(rewritten.dataType, fn.dataType))
        Some(Cast(rewritten, fn.dataType))
      else None
    }
    // rewrite an aggregate LEAF over the view: key-exact distinct/HLL
    // re-run over the view's key column; everything else re-aggregates
    // partials through reAgg (which already casts to the original type).
    // A validated FILTER clause (key-only — see filterOverKeys) remaps to
    // the view's attributes and rides the rewritten aggregate: the
    // predicate is constant within each group, so filtering view rows
    // selects exactly the base rows the original filter selected.
    def reAggE(ae: AggregateExpression): Option[Expression] = {
      val filt: Option[Expression] = ae.filter.map(_.transform {
        case a: AttributeReference => vAttr(a.name)
      })
      def complete(f: AggregateFunction, distinct: Boolean): AggregateExpression =
        AggregateExpression(f, Complete, isDistinct = distinct,
          filter = filt, resultId = NamedExpression.newExprId)
      def kmvOver(name: String, k: Int): Option[Expression] =
        partials.kmvs.get(name).map(vAttr).collect {
          // the partial must really be a hash array — a mis-registered
          // column falls back to the base instead of misbehaving
          case a if a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
              a.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
                .elementType == org.apache.spark.sql.types.LongType =>
            complete(graft.plans.KmvMerge(a, k), distinct = false)
        }
      def allKeyRefs(fn: AggregateFunction): Boolean = {
        val refs = fn.references.toSeq
        refs.nonEmpty && refs.forall(r => keySet.contains(r.name))
      }
      if (ae.isDistinct) ae.aggregateFunction match {
        case fn @ (_: Count | _: Sum | _: Average | _: Percentile)
            if allKeyRefs(fn) && fn.deterministic =>
          // identical distinct value set over the view → the SAME distinct
          // aggregate, key attrs remapped (exact for any input type — no
          // re-aggregation happens, so even decimal AVG is admissible)
          Some(complete(fn.transform {
            case a: AttributeReference => vAttr(a.name)
          }.asInstanceOf[AggregateFunction], distinct = true))
        case Count(Seq(a: AttributeReference)) if approxDistinct =>
          // COUNT returns LONG; the sketch estimates in double — round to
          // the nearest count (explicitly approximate, conf-gated)
          kmvOver(a.name, partials.kmvK).map(est =>
            Cast(Round(est, Literal(0)), org.apache.spark.sql.types.LongType))
        case _ => None
      } else ae.aggregateFunction match {
        case hll: HyperLogLogPlusPlus =>
          Some(complete(hll.withNewChildren(hll.children.map {
            case a: AttributeReference => vAttr(a.name)
            case c => c
          }).asInstanceOf[AggregateFunction], distinct = false))
        case ks: graft.plans.KmvSketch => ks.child match {
          case a: AttributeReference => kmvOver(a.name, ks.k)
          case _ => None
        }
        case pc: Percentile if percentileOverKey(pc) => pc.child match {
          case a: AttributeReference =>
            // same value type (the measure IS the view key column), same
            // percentage expression → identical result type; frequency
            // becomes the maintained per-value multiplicity
            partials.countCol.map(vAttr).map(freq => complete(
              Percentile(vAttr(a.name), pc.percentageExpression, freq,
                0, 0, pc.reverse), distinct = false))
          case _ => None
        }
        case fn => reAgg(fn, filt)
      }
    }
    // explicit recursion, NOT transformDown: the replacement expressions
    // contain fresh AggregateExpressions (Coalesce(Sum…), Divide(Sum…))
    // that the rule must never re-enter — aggregate leaves replace whole,
    // grouping attrs remap to the view, interior nodes rebuild around
    // their rebuilt children
    def rebuild(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => reAggE(ae)
      case a: AttributeReference => vAttr.get(a.name)
      case l: Literal => Some(l)
      case o =>
        val kids = o.children.map(rebuild)
        if (kids.exists(_.isEmpty)) None
        else Some(o.withNewChildren(kids.map(_.get)))
    }
    val outs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(vAttr(a.name), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case al @ Alias(e, name) =>
        rebuild(e) match {
          case Some(r) => Alias(r, name)(exprId = al.exprId, qualifier = al.qualifier)
          case None => return None
        }
      case _ => return None // unreachable: validated above
    }
    Some(Aggregate(gExprs, outs, filtered, None))
  }

  /** ROLLUP / CUBE / GROUPING SETS navigation: rewrite
    *     Aggregate(keys ++ gid, aggs, Expand(projections, out, Scan(base)))
    * to the SAME Aggregate-over-Expand over the view. The Expand mechanics
    * (per-set null placeholders + spark_grouping_id) are kept verbatim —
    * that is what keeps a GENUINE null key distinguishable from a rollup
    * placeholder, exactly as over the base — only the pass-through data
    * columns become view partials and the aggregates re-aggregate them.
    * Every grouping set is a key subset, and all admitted aggregates are
    * reassociable, so re-aggregating |keys| view rows per set is exact.
    *
    * Guards (each failing toward the base): every Expand slot must
    * classify as (a) the SAME pass-through column in all sets, (b) a
    * view-key column alternating with a typed null, or (c) the literal
    * grouping-id slot; key types must match the view's; filters under the
    * Expand must be key-only; the aggregate list must validate exactly as
    * in [[rebuildOntoView]]. Shapes like the distinct-aggregate Expand
    * fail classification and fall through untouched. */
  def rebuildRollupOntoView(
      agg: Aggregate,
      expand: org.apache.spark.sql.catalyst.plans.logical.Expand,
      filters: Seq[Expression],
      keys: Seq[String],
      partials: Partials,
      fresh: () => Boolean,
      view: () => DataFrame): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.Expand
    val keySet = keys.toSet
    if (expand.projections.isEmpty) return None
    val width = expand.output.size
    if (expand.projections.exists(_.size != width)) return None

    // classify each expand output slot across ALL grouping sets
    sealed trait Slot
    case class Pass(a: AttributeReference) extends Slot
    case class Key(a: AttributeReference, out: Attribute) extends Slot
    case object Gid extends Slot
    val slots: Seq[Slot] = (0 until width).map { i =>
      val vals = expand.projections.map(_(i))
      val attrs = vals.collect { case a: AttributeReference => a }.distinct
      val allLitInts = vals.forall {
        case Literal(_, t) =>
          t == org.apache.spark.sql.types.IntegerType ||
            t == org.apache.spark.sql.types.LongType
        case _ => false
      }
      if (attrs.size == 1 && vals.forall(_.isInstanceOf[AttributeReference]))
        Pass(attrs.head)
      else if (attrs.size == 1 && vals.forall {
          case _: AttributeReference => true
          case Literal(null, t) => t == attrs.head.dataType
          case _ => false
        }) Key(attrs.head, expand.output(i))
      else if (allLitInts) Gid
      else return None
    }
    val keySlots = slots.collect { case k: Key => k }
    if (!keySlots.forall(k => keySet.contains(k.a.name))) return None
    // filters under the Expand commute only over keys
    if (!filters.forall(f => f.deterministic &&
        f.references.forall(a => keySet.contains(a.name))))
      return None
    // aggregate list: grouping attrs are the Expand's key/gid OUTPUTS;
    // everything else must be an expression tree over rewritable
    // aggregates of pass-through columns — ratio-of-aggregates and
    // measure arithmetic rewrite here exactly as on the flat path (the
    // key-exact distinct family does NOT: inside a rollup the key
    // columns ride the Expand as nulled placeholder slots, so a distinct
    // over them is a different relation — partial-backed leaves only)
    val groupedAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference => a.exprId }.toSet
    def servable(ae: AggregateExpression): Boolean =
      !ae.isDistinct && ae.filter.isEmpty &&
        partialsFor(partials, ae.aggregateFunction).isDefined
    def exprOk(e: Expression): Boolean = e match {
      case ae: AggregateExpression => servable(ae)
      case a: AttributeReference => groupedAttrs.contains(a.exprId)
      case _: Literal => true
      case o => o.deterministic && o.children.nonEmpty && o.children.forall(exprOk)
    }
    agg.aggregateExpressions.foreach {
      case a: AttributeReference if groupedAttrs.contains(a.exprId) => ()
      case Alias(e, _) if exprOk(e) => ()
      case _ => return None
    }
    if (!fresh()) return None

    val viewPlan = view().queryExecution.analyzed
    val vAttr: Map[String, Attribute] = viewPlan.output.map(a => a.name -> a).toMap
    val neededPartials = agg.aggregateExpressions.flatMap {
      case Alias(e, _) => e.collect {
        case ae: AggregateExpression =>
          partialsFor(partials, ae.aggregateFunction).get
      }.flatten
      case _ => Nil
    }.distinct
    val neededKeys = keySlots.map(_.a.name) ++
      filters.flatMap(_.references.map(_.name))
    if (!(neededPartials ++ neededKeys).forall(vAttr.contains)) return None
    // key types must match the view's columns — the null placeholders and
    // the preserved output attrs keep the ORIGINAL types
    if (!keySlots.forall(k => vAttr(k.a.name).dataType == k.a.dataType))
      return None

    val remapped = filters.map(_.transform {
      case a: AttributeReference => vAttr(a.name)
    })
    val filtered = remapped.foldLeft(viewPlan)((p, c) => Filter(c, p))
    // new expand: one pass-through slot per needed partial (the view attr
    // rides through, same convention as the original plan's data columns),
    // then the ORIGINAL key/gid slots with their output attrs preserved
    // (the aggregate's grouping expressions keep resolving untouched)
    val keptIdx = slots.zipWithIndex.collect {
      case (_: Key, i) => i
      case (Gid, i) => i
    }
    val newProjections = expand.projections.map { proj =>
      neededPartials.map(p => vAttr(p): Expression) ++
        keptIdx.map { i =>
          proj(i) match {
            case a: AttributeReference => vAttr(a.name): Expression
            case other => other // typed null / gid literal, kept verbatim
          }
        }
    }
    val newOutput: Seq[Attribute] =
      neededPartials.map(vAttr) ++ keptIdx.map(expand.output)
    val newExpand = Expand(newProjections, newOutput, filtered)

    // rollup grouping is never empty in practice (key/gid outputs), but a
    // global COUNT over an empty view must still answer 0, not NULL
    val globalAgg = agg.groupingExpressions.isEmpty
    def reAgg(fn: AggregateFunction): Option[Expression] = {
      def complete(f: AggregateFunction): AggregateExpression =
        AggregateExpression(f, Complete, isDistinct = false,
          filter = None, resultId = NamedExpression.newExprId)
      val cols = partialsFor(partials, fn).get
      val rewritten: Expression = fn match {
        case _: Count =>
          val s = complete(Sum(vAttr(cols.head)))
          if (globalAgg) Coalesce(Seq(s, Literal(0L))) else s
        case _: Sum => complete(Sum(vAttr(cols.head)))
        case _: Min => complete(Min(vAttr(cols.head)))
        case _: Max => complete(Max(vAttr(cols.head)))
        case _: Average =>
          val Seq(s, c) = cols
          Divide(Cast(complete(Sum(vAttr(s))), DoubleType),
            Cast(complete(Sum(vAttr(c))), DoubleType), EvalMode.LEGACY)
        case _: VarianceSamp | _: VariancePop | _: StddevSamp |
             _: StddevPop | _: Skewness | _: Kurtosis =>
          // same power-sum serving as the flat path — the family's
          // partials are plain reassociable sums, so they ride the
          // rollup's Expand like any other partial column
          momentsOnto(fn, cols.map(vAttr), complete) match {
            case Some(e) => e
            case None => return None
          }
        // regr before Covariance: RegrSXY subclasses Covariance
        case _: RegrReplacement | _: RegrSXY | _: RegrSlope |
             _: RegrIntercept | _: RegrR2 =>
          regrOnto(fn, cols.map(vAttr), complete) match {
            case Some(e) => e
            case None => return None
          }
        case _: Covariance | _: PearsonCorrelation =>
          covarianceOnto(fn, cols.map(vAttr), complete) match {
            case Some(e) => e
            case None => return None
          }
        case _ => return None
      }
      if (rewritten.dataType == fn.dataType) Some(rewritten)
      else if (typeOk(rewritten.dataType, fn.dataType))
        Some(Cast(rewritten, fn.dataType))
      else None
    }
    // explicit recursion (see the flat path): aggregate leaves replace
    // whole and are never re-entered; grouping attrs (Expand outputs) and
    // literals pass through UNREMAPPED — the new Expand preserves their
    // attribute ids
    def rebuild(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => reAgg(ae.aggregateFunction)
      case a: AttributeReference => Some(a)
      case l: Literal => Some(l)
      case o =>
        val kids = o.children.map(rebuild)
        if (kids.exists(_.isEmpty)) None
        else Some(o.withNewChildren(kids.map(_.get)))
    }
    val outs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupedAttrs.contains(a.exprId) => a
      case al @ Alias(e, name) =>
        rebuild(e) match {
          case Some(r) => Alias(r, name)(exprId = al.exprId, qualifier = al.qualifier)
          case None => return None
        }
      case _ => return None // unreachable: validated above
    }
    Some(Aggregate(agg.groupingExpressions, outs, newExpand, None))
  }
}

object MatViewRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.matviewRewrite.enabled"

  /** OPT-IN: admit COUNT(DISTINCT x) → KMV sketch estimate over a view
    * maintaining a `kmvs` partial for x. The only rewrite that CHANGES a
    * result (to the estimate), so it is off unless the session says so. */
  val ApproxDistinctKey = "spark.graft.matviewRewrite.approxDistinct"

  def apply(plan: LogicalPlan): LogicalPlan = {
    val defs = MatView.all
    if (defs.isEmpty || !conf.getConfString(EnabledKey, "true").toBoolean) plan
    else {
      val approx = conf.getConfString(ApproxDistinctKey, "false").toBoolean
      // memoize each registration's root-set probe for THE ONE pass over
      // this plan: baseRoots() reads version pointers/manifests from the
      // filesystem, and a multi-aggregate query must not pay (nor
      // inconsistently re-read) it once per Aggregate node per view
      val rootsOf = MatViewSupport.memo((d: MatView.Def) => d.baseRoots())
      plan.transform {
        case agg @ Aggregate(_, _, _, _) =>
          tryRewrite(agg, defs, rootsOf, approx).getOrElse(agg)
      }
    }
  }

  /** The def-independent part of the match — peel the Aggregate's child
    * (rollup Expand kept aside) down to one file scan, SUBSTITUTING any
    * computed deterministic aliases the peeled Projects carry back into
    * the aggregate and the filters (the analyzer's
    * PullOutGroupingExpressions hides a GROUP BY expression behind a
    * `_groupingexpression` Project; withColumnRenamed leaves a rename
    * alias — both become plain expressions over base columns here, which
    * the view-key checks understand). Returns the substituted Aggregate.
    * Left = why this aggregate can never match ANY single-base view
    * (shared by [[MatViewExplain]] as the human-readable reason). */
  private[plans] def shapeOf(agg: Aggregate): Either[String,
      (Aggregate, Option[org.apache.spark.sql.catalyst.plans.logical.Expand],
        Seq[Expression], Seq[String])] = {
    val (expandOpt, src) = agg.child match {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand =>
        (Some(e), e.child)
      case other => (None, other)
    }
    MatViewSupport.stripSubst(src, Nil) match {
      case None => scala.Left("no single file scan under the aggregate " +
        "(a join, non-deterministic projection, or other operator in between)")
      // a computed Project under a rollup Expand would need the same
      // substitution inside the Expand's slot classification — unsupported
      case Some((_, _, m)) if m.nonEmpty && expandOpt.isDefined =>
        scala.Left("computed projections under a ROLLUP/CUBE Expand are " +
          "unsupported — fall back")
      case Some((filters0, rel, m)) =>
        val roots = MatViewSupport.scanRoots(rel)
        if (roots.isEmpty) scala.Left("the scanned relation is not a file source")
        else {
          def sub(e: Expression): Expression = e.transform {
            case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
          }
          def subNamed(ne: NamedExpression): NamedExpression = ne match {
            case a: AttributeReference if m.contains(a.exprId) =>
              Alias(m(a.exprId), a.name)(exprId = a.exprId,
                qualifier = a.qualifier)
            case other => sub(other).asInstanceOf[NamedExpression]
          }
          val aggS = if (m.isEmpty) agg else agg.copy(
            groupingExpressions = agg.groupingExpressions.map(sub),
            aggregateExpressions = agg.aggregateExpressions.map(subNamed))
          scala.Right((aggS, expandOpt, filters0.map(sub), roots))
        }
    }
  }

  /** Probe ONE registration against a shaped aggregate. Right = the
    * rewritten plan; Left = a LAZY reason (the hot rewrite path never
    * forces it — [[MatViewExplain]] does, paying the freshness probe only
    * when a human asked). Guard order preserved from the original rule:
    * roots (pure) → where (pure) → rebuild (shape checks first, freshness
    * IO only after the shape matched). */
  private[plans] def probeDef(agg: Aggregate,
      expandOpt: Option[org.apache.spark.sql.catalyst.plans.logical.Expand],
      filters: Seq[Expression], roots: Seq[String], d: MatView.Def,
      expected: Set[String],
      approxDistinct: Boolean): Either[() => String, LogicalPlan] = {
    if (!MatViewSupport.covers(roots, expected))
      scala.Left(() => "scan-root mismatch: the query reads a different (or " +
        "pruned/partial) relation than the registered base")
    else MatViewSupport.consumeWhere(filters, d.where()) match {
      case None => scala.Left(() => "the view's WHERE slice is not carried or " +
        "implied by the query's filter conjuncts")
      case Some(kept) =>
        val rebuilt = expandOpt match {
          case Some(e) => MatViewSupport.rebuildRollupOntoView(agg, e, kept,
            d.keys, d.partials, d.fresh, d.view)
          case None => MatViewSupport.rebuildOntoView(agg, kept, d.keys,
            d.partials, d.fresh, d.view, approxDistinct)
        }
        rebuilt.toRight(() =>
          if (!scala.util.Try(d.fresh()).getOrElse(false))
            "stale: the view's applied-version marker lags the base's " +
              "committed version — re-run maintenance"
          else "shape: a grouping column, filter, or aggregate is not " +
            "servable from the view's keys/partials")
    }
  }

  private def tryRewrite(agg: Aggregate, defs: Seq[MatView.Def],
      rootsOf: MatView.Def => Set[String],
      approxDistinct: Boolean): Option[LogicalPlan] =
    shapeOf(agg).toOption.flatMap { case (aggS, expandOpt, filters, roots) =>
      defs.view.flatMap(d =>
        probeDef(aggS, expandOpt, filters, roots, d, rootsOf(d),
          approxDistinct).toOption).headOption
    }
}

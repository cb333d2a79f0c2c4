package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Datamart-layer analytics — the reference's `datamart` schema is created
  * but empty (configure.py:46-52); these are the §7.6 extension aggregates,
  * sized for the 100 TB path: group-by shuffles on bounded key spaces,
  * top-k via TakeOrdered (no global sort), windows partitioned by key.
  *
  * All money folds are DECIMAL → one cast to DOUBLE (Registry conventions).
  */
object MartQueries {
  import Registry.{epochS, epochSql, money}

  private def revenue = // l_extendedprice * (1 - l_discount), exact
    money(col("l_extendedprice")) *
      (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(3,2)")

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))"

  private val docWordsSql = "list_filter(string_split(text, ' '), x -> len(x) > 0)"

  def all: Seq[Q] = Seq(

    // TPC-H Q1 shape: scan-heavy grouped aggregation, 6 aggregates.
    Q("q1_pricing_summary",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
        val charge = revenue * (lit(1) + col("l_tax").cast("decimal(3,2)")).cast("decimal(3,2)")
        li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(revenue).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          (sum(col("l_quantity").cast("decimal(12,2)")).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"),
          (sum(money(col("l_extendedprice"))).cast("double") /
            count(lit(1)).cast("double")).as("avg_price"),
          (sum(col("l_discount").cast("decimal(3,2)")).cast("double") /
            count(lit(1)).cast("double")).as("avg_disc"),
          count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(3,2)) * CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q3 shape: selective join + grouped agg + top-k.
    // Top-k is TakeOrdered in Spark (no full sort); total ordering via the
    // (revenue DESC, l_orderkey) tie-break on both engines.
    Q("q3_top_revenue_orders",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") < lit("1997-06-01").cast("date"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate").cast("date") > lit("1997-06-01").cast("date"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND CAST(o_orderdate AS DATE) < DATE '1997-06-01'
             |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-01'
             |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape: 6-way star join, revenue per nation.
    Q("q5_region_volume",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date"))
          .filter(col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
        val c = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"))
      },
      Some(s"""SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
             |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
             |GROUP BY n_name""".stripMargin)),

    // TPC-H Q6 shape: pure scan + selective filter + single aggregate —
    // the pushdown showcase (all three predicates reach the parquet scan;
    // no shuffle at all, one partial+final agg).
    Q("q6_forecast_revenue",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate").cast("date") < lit("1997-01-01").cast("date") &&
          col("l_discount").cast("decimal(3,2)")
            .between(lit("0.05").cast("decimal(3,2)"), lit("0.07").cast("decimal(3,2)")) &&
          col("l_quantity") < 24)
        .agg(sum(money(col("l_extendedprice")) * col("l_discount").cast("decimal(3,2)"))
          .cast("double").as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
             |  AND CAST(l_discount AS DECIMAL(3,2)) BETWEEN CAST('0.05' AS DECIMAL(3,2)) AND CAST('0.07' AS DECIMAL(3,2))
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue ranking — selective fact
    // filters, star join (bounded nation broadcast), top-20 TakeOrdered.
    Q("q10_returned_items",
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") >= lit("1996-10-01").cast("date"))
          .filter(col("o_orderdate").cast("date") < lit("1997-01-01").cast("date"))
        val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"),
            money(col("c_acctbal")).cast("double").as("c_acctbal"), col("n_name"))
          .agg(sum(revenue).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name,
             |  CAST(CAST(c_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS c_acctbal, n_name,
             |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
             |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
             |GROUP BY c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(14,2)) AS DOUBLE), n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q14 shape: promo revenue share — conditional aggregation over a
    // broadcast dim join, two sums in one pass.
    Q("q14_promo_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >= lit("1996-03-01").cast("date"))
          .filter(col("l_shipdate").cast("date") < lit("1996-04-01").cast("date"))
        li.join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) *
            sum(when(col("p_type") === "PROMO", revenue).otherwise(lit("0.00").cast("decimal(14,2)"))).cast("double") /
            sum(revenue).cast("double")).as("promo_pct"))
      },
      Some(s"""SELECT 100.0 *
             |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE CAST('0.00' AS DECIMAL(14,2)) END) AS DOUBLE)
             |  / CAST(SUM($revenueSql) AS DOUBLE) AS promo_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01'
             |  AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'""".stripMargin)),

    // TPC-H Q18 shape: large-volume orders — grouped HAVING on the fact,
    // then key joins back to orders/customer. The heavy groupBy runs FIRST
    // (partial agg before the shuffle) and its survivors drive the joins.
    Q("q18_large_orders",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"))
          .filter(col("sum_qty") > lit(350))
        Tables.orders(s, d).join(big, col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            epochS(col("o_orderdate")).as("o_epoch"),
            money(col("o_totalprice")).cast("double").as("o_totalprice"),
            col("sum_qty").cast("double").as("sum_qty"))
      },
      Some(s"""SELECT c_custkey, c_name, o_orderkey, ${epochSql("o_orderdate")} AS o_epoch,
             |  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS o_totalprice,
             |  CAST(sum_qty AS DOUBLE) AS sum_qty
             |FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 350) b
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // TPC-H Q19 shape: disjunctive join predicate — Catalyst extracts the
    // common equi key (partkey) and keeps the OR-of-conjuncts as the join
    // filter, so this stays a broadcast HASH join (PlanSpec's no-BNLJ sweep
    // proves it), unlike the naive reading of an OR join condition.
    Q("q19_brand_quantity_revenue",
      (s, d) => {
        val disj =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 30)
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey") && disj)
          .agg(sum(revenue).cast("double").as("revenue"))
      },
      Some(s"""SELECT CAST(SUM($revenueSql) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
             |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
             |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin)),

    // TPC-H Q9 shape: 5-way star join (two broadcast dims) with a derived
    // profit measure, grouped by nation × order year. (The reference
    // part-cost table doesn't exist in the fixture set; cost is derived
    // from p_retailprice — the JOIN SHAPE is the point.)
    Q("q9_profit_by_nation",
      (s, d) => {
        val cost = (col("p_retailprice").cast("decimal(14,2)") *
          lit("0.60").cast("decimal(3,2)")).cast("decimal(14,2)")
        val profit = revenue - (cost * col("l_quantity").cast("decimal(12,2)"))
          .cast("decimal(18,2)")
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(profit).cast("double").as("profit"))
      },
      Some(s"""SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(SUM($revenueSql
             |    - CAST(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * CAST('0.60' AS DECIMAL(3,2)) AS DECIMAL(14,2))
             |      * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,2))) AS DOUBLE) AS profit
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN part ON l_partkey = p_partkey
             |JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name, year(o_orderdate)""".stripMargin)),

    // Correlated scalar subqueries — customers above their nation's
    // average balance. Catalyst DECORRELATES these into an aggregate +
    // join (the no-BNLJ plan sweep proves no per-row subquery execution
    // survives). The threshold is multiplication-only in exact decimal
    // (bal·cnt > sum) — comparing against a floating AVG would let
    // summation order flip boundary rows between engines (q17/q22 rule).
    Q("sub1_above_nation_avg",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_sub1")
        s.sql("""SELECT c_custkey, c_nationkey,
                |  CAST(CAST(c_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS c_acctbal
                |FROM graft_cust_sub1 c
                |WHERE CAST(c_acctbal AS DECIMAL(14,2)) *
                |    (SELECT COUNT(*) FROM graft_cust_sub1 c2
                |     WHERE c2.c_nationkey = c.c_nationkey) >
                |  (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(14,2))) FROM graft_cust_sub1 c3
                |   WHERE c3.c_nationkey = c.c_nationkey)""".stripMargin)
      },
      Some("""SELECT c_custkey, c_nationkey,
             |  CAST(CAST(c_acctbal AS DECIMAL(14,2)) AS DOUBLE) AS c_acctbal
             |FROM customer c
             |WHERE CAST(c_acctbal AS DECIMAL(14,2)) *
             |    (SELECT COUNT(*) FROM customer c2
             |     WHERE c2.c_nationkey = c.c_nationkey) >
             |  (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(14,2))) FROM customer c3
             |   WHERE c3.c_nationkey = c.c_nationkey)""".stripMargin)),

    // NOT IN with a NULL-bearing subquery — the classic three-valued-logic
    // trap: one NULL in the IN-list makes NOT IN never-true, so the query
    // must return ZERO rows on BOTH engines (c_custkey 0 exists, NULLIF
    // injects the NULL). Guards the engine against "optimizing" NOT IN
    // into a plain anti join.
    Q("sub2_not_in_null_semantics",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders_sub2")
        Tables.customer(s, d).createOrReplaceTempView("graft_cust_sub2")
        s.sql("""SELECT o_orderkey FROM graft_orders_sub2
                |WHERE o_custkey NOT IN
                |  (SELECT NULLIF(c_custkey, 0) FROM graft_cust_sub2)""".stripMargin)
      },
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_custkey NOT IN (SELECT NULLIF(c_custkey, 0) FROM customer)""".stripMargin)),

    // TPC-H Q17 shape: correlated aggregate against the join partner —
    // lineitems under 20% of their part's average quantity. Decorrelates
    // to a per-part aggregate joined back (one pass + broadcast join).
    Q("q17_small_quantity_revenue",
      (s, d) => {
        // qty < 0.2·avg  ⟺  5·qty·cnt < sum — multiplication-only, so the
        // comparison is EXACT decimal arithmetic on both engines (an
        // avg/0.2-multiply form rounds at the division and can flip
        // boundary rows between engines)
        val perPart = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("ap_partkey"))
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"),
            count(lit(1)).as("cnt"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)).filter(col("p_brand") === "Brand#1"),
            col("l_partkey") === col("p_partkey"))
          .join(perPart, col("l_partkey") === col("ap_partkey"))
          .filter(col("l_quantity").cast("decimal(12,2)") * lit(5) * col("cnt") <
            col("sum_qty"))
          .agg((sum(money(col("l_extendedprice"))).cast("double") / lit(7.0)).as("avg_yearly"))
      },
      Some("""WITH a AS (SELECT l_partkey AS ap_partkey,
             |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1)
             |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0 AS avg_yearly
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |JOIN a ON l_partkey = ap_partkey
             |WHERE p_brand = 'Brand#1'
             |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_qty""".stripMargin)),

    // UNPIVOT (melt) — the pivot inverse, round-tripped: wide per-status
    // counts back to (priority, status, n) rows, NULL cells (absent
    // combos) dropped, which must reproduce the plain GROUP BY.
    Q("un1_unpivot_roundtrip",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .unpivot(Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")), "o_orderstatus", "n")
        .filter(col("n").isNotNull),
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
             |FROM orders GROUP BY 1, 2""".stripMargin)),

    // TPC-H Q22 shape: above-average-balance customers with no URGENT
    // orders — an uncorrelated global aggregate broadcast as a filter,
    // composed with a left anti join, grouped by nation. ("no orders at
    // all" is empty at every fixture SF; urgency keeps the shape AND the
    // rows.) The threshold is multiplication-only (bal·cnt > sum), exact
    // decimal on both engines — same trick as q17.
    Q("q22_dormant_rich_customers",
      (s, d) => {
        val c = Tables.customer(s, d)
        val bal = c.filter(col("c_acctbal") > 0)
          .agg(sum(money(col("c_acctbal"))).as("sum_bal"), count(lit(1)).as("cnt"))
        val rich = c.crossJoin(broadcast(bal))
          .filter(money(col("c_acctbal")) * col("cnt") > col("sum_bal"))
        rich.join(
            Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            sum(money(col("c_acctbal"))).cast("double").as("totacctbal"))
      },
      Some("""WITH b AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS sum_bal, COUNT(*) AS cnt
             |          FROM customer WHERE c_acctbal > 0)
             |SELECT c_nationkey, COUNT(*) AS numcust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
             |FROM customer c, b
             |WHERE CAST(c_acctbal AS DECIMAL(14,2)) * cnt > sum_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey""".stripMargin)),

    // TPC-H Q11 shape: grouped value vs a GLOBAL scalar threshold (HAVING
    // against a fraction of the total). Multiply-only comparison
    // (pval·2500 > total ⟺ pval > total/2500) keeps the decimal
    // arithmetic exact on both engines — a division form rounds and can
    // flip boundary parts. The scalar side is one broadcast row.
    Q("q11_important_parts",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val perPart = li.groupBy(col("l_partkey"))
          .agg(sum(money(col("l_extendedprice"))).as("pval"))
        val total = li.agg(sum(money(col("l_extendedprice"))).as("tot"))
        perPart.crossJoin(broadcast(total))
          .filter(col("pval") * lit(2500) > col("tot"))
          .select(col("l_partkey"), col("pval").cast("double").as("part_value"))
      },
      Some("""WITH p AS (SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS pval
             |           FROM lineitem GROUP BY 1),
             |     t AS (SELECT SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS tot FROM lineitem)
             |SELECT l_partkey, CAST(pval AS DOUBLE) AS part_value
             |FROM p, t WHERE pval * 2500 > tot""".stripMargin)),

    // TPC-H Q15 shape: argmax by scalar subquery — per-supplier revenue
    // over one quarter, keep the supplier(s) whose revenue EQUALS the
    // max. Decimal folds are exact, so the equality is engine-portable
    // (a double fold would make `= max` a coin flip at the ulp).
    Q("q15_top_supplier",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
            col("l_shipdate").cast("date") < lit("1996-04-01").cast("date"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revenue).as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_revenue") === col("mx"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_revenue").cast("double").as("total_revenue"))
      },
      Some(s"""WITH r AS (SELECT l_suppkey, SUM($revenueSql) AS total_revenue
             |           FROM lineitem
             |           WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             |             AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
             |           GROUP BY 1)
             |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
             |FROM supplier JOIN r ON s_suppkey = l_suppkey
             |WHERE total_revenue = (SELECT MAX(total_revenue) FROM r)""".stripMargin)),

    // TPC-H Q20 shape: IN-subquery with a per-group share threshold —
    // suppliers who shipped more than 1/8 of some Brand#2 part's total
    // quantity (the synthetic data spreads each part over ~10-30
    // suppliers, so TPC-H's literal half-share never occurs; the shape —
    // nested agg + share predicate + IN — is what's being exercised).
    // The part total re-aggregates the (part,supp) rollup
    // instead of rescanning lineitem: one wide shuffle feeds both levels
    // (at 100 TB the second agg runs on the already-reduced rollup).
    Q("q20_majority_part_suppliers",
      (s, d) => {
        val perPartSupp = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sq"))
        val perPart = perPartSupp.groupBy(col("l_partkey"))
          .agg(sum(col("sq")).as("tq"))
        val majority = perPartSupp
          .join(perPart, Seq("l_partkey"))
          .filter(col("sq") * lit(8) > col("tq"))
          .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#2")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_suppkey")).distinct()
        majority
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"))
      },
      Some("""WITH ps AS (SELECT l_partkey, l_suppkey,
             |      SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
             |    FROM lineitem GROUP BY 1, 2),
             |  p AS (SELECT l_partkey, SUM(sq) AS tq FROM ps GROUP BY 1)
             |SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT ps.l_suppkey
             |  FROM ps JOIN p USING (l_partkey) JOIN part ON ps.l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#2' AND ps.sq * 8 > p.tq)""".stripMargin)),

    // Generated calendar dimension — the warehouse dim_date: one row per
    // day from a pure sequence (no source table), with the standard
    // attribute columns. Engine date-part parity: Spark dayofweek is
    // 1=Sunday, DuckDB's is 0=Sunday, hence the -1.
    Q("dim1_date_dimension",
      (s, d) => s.range(1).select(
          explode(sequence(
            lit("1995-01-01").cast("date"), lit("1995-12-31").cast("date"),
            expr("interval 1 day"))).as("d"))
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("d"),
          year(col("d")).as("y"),
          quarter(col("d")).as("q"),
          month(col("d")).as("m"),
          dayofmonth(col("d")).as("dom"),
          dayofyear(col("d")).as("doy"),
          (dayofweek(col("d")) - 1).as("dow"),
          (dayofweek(col("d")).isin(1, 7)).as("is_weekend")),
      Some("""SELECT strftime(d, '%Y-%m-%d') AS d, year(d) AS y, quarter(d) AS q,
             |  month(d) AS m, dayofmonth(d) AS dom, dayofyear(d) AS doy,
             |  dayofweek(d) AS dow, dayofweek(d) IN (0, 6) AS is_weekend
             |FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31',
             |                                         INTERVAL 1 DAY)) AS DATE) AS d)""".stripMargin)),

    // Window functions: per-customer running total + order rank.
    Q("w1_running_totals",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("rn"),
          sum(money(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  row_number() OVER w AS rn,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // RANGE window frame: trailing-30-day order stats per customer. RANGE
    // (unlike ROWS) is tie-insensitive — every order on the same date sees
    // the same frame — so no tie-break column is even needed for
    // determinism. Frame bounds are epoch seconds.
    Q("w2_trailing_30d",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(epochS(col("o_orderdate")))
          .rangeBetween(-30L * 86400, 0)
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("n_trailing"),
          sum(money(col("o_totalprice"))).over(w).cast("double").as("sum_trailing"))
      },
      Some(s"""SELECT o_orderkey, o_custkey,
             |  COUNT(*) OVER w AS n_trailing,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE) AS sum_trailing
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY ${epochSql("o_orderdate")}
             |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Ranking-function family over one window: rank/dense_rank carry ties,
    // percent_rank/cume_dist are exact small-integer ratios (bit-identical
    // doubles on both engines), ntile fills larger buckets first (SQL
    // standard on both). Total ordering via the orderkey tie-break.
    Q("w3_rank_family",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderstatus"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).as("quartile"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  rank() OVER w AS rnk,
             |  dense_rank() OVER w AS drnk,
             |  percent_rank() OVER w AS prnk,
             |  cume_dist() OVER w AS cdist,
             |  ntile(4) OVER w AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin)),

    // MapType + higher-order map functions: per-status map of
    // priority → order count (map_from_entries over a sorted nested agg),
    // exploded back to rows. The oracle is the flat two-level GROUP BY the
    // map round-trip must preserve exactly.
    Q("map1_priority_counts",
      (s, d) => {
        val counts = Tables.orders(s, d)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val mapped = counts.groupBy(col("o_orderstatus"))
          .agg(map_from_entries(sort_array(
            collect_list(struct(col("o_orderpriority"), col("n"))))).as("m"))
        mapped.select(col("o_orderstatus"), explode(col("m")).as(Seq("o_orderpriority", "n")))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
             |FROM orders GROUP BY 1, 2""".stripMargin)),

    // ROLLUP hierarchy totals.
    Q("rollup_orders",
      (s, d) => Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(money(col("o_totalprice"))).cast("double").as("total_price")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin)),

    // As-of join: each event paired with the user's most recent purchase
    // at-or-before it (graft.ops.AsOf union-sort composition; oracle is
    // DuckDB's NATIVE ASOF LEFT JOIN — two independent implementations).
    Q("asof1_last_purchase",
      (s, d) => {
        val e = Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          col("value"), Registry.epochS(col("ts")).as("es"))
        val purchases = graft.ops.MergeOps.latestByKey(
          e.filter(col("event_type") === "purchase"),
          Seq("user_id", "es"), Seq(col("event_id")))
          .select(col("user_id"), col("es"),
            col("es").as("p_es"), col("value").as("p_value"))
        graft.ops.AsOf.asofJoinLeft(
          e.select(col("event_id"), col("user_id"), col("es")),
          purchases, "user_id", "es", "es", Seq("p_es", "p_value"))
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type, value,
             |    ${epochSql("ts")} AS es FROM events),
             |p0 AS (SELECT user_id, es, value,
             |    row_number() OVER (PARTITION BY user_id, es ORDER BY event_id DESC) AS rn
             |  FROM e WHERE event_type = 'purchase'),
             |p AS (SELECT user_id, es, es AS p_es, value AS p_value FROM p0 WHERE rn = 1)
             |SELECT e.event_id, e.user_id, e.es, p.p_es, p.p_value
             |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.es >= p.es""".stripMargin)),

    // Forward as-of: for each event, the NEXT purchase at-or-after it per
    // user (attribution direction: impression → following conversion).
    // Same dedup discipline as asof1; DuckDB's `<=` ASOF is the oracle.
    Q("asof2_next_purchase",
      (s, d) => {
        val e = Tables.events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          col("value"), Registry.epochS(col("ts")).as("es"))
        val purchases = graft.ops.MergeOps.latestByKey(
          e.filter(col("event_type") === "purchase"),
          Seq("user_id", "es"), Seq(col("event_id")))
          .select(col("user_id"), col("es"),
            col("es").as("p_es"), col("value").as("p_value"))
        graft.ops.AsOf.asofJoinLeftForward(
          e.select(col("event_id"), col("user_id"), col("es")),
          purchases, "user_id", "es", "es", Seq("p_es", "p_value"))
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, event_type, value,
             |    ${epochSql("ts")} AS es FROM events),
             |p0 AS (SELECT user_id, es, value,
             |    row_number() OVER (PARTITION BY user_id, es ORDER BY event_id DESC) AS rn
             |  FROM e WHERE event_type = 'purchase'),
             |p AS (SELECT user_id, es, es AS p_es, value AS p_value FROM p0 WHERE rn = 1)
             |SELECT e.event_id, e.user_id, e.es, p.p_es, p.p_value
             |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.es <= p.es""".stripMargin)),

    // Range join: event pairs within one hour per user. Banded into an
    // equi-join — each right row registers in its bucket and both
    // neighbors, the join is on (user, bucket), the exact interval
    // predicate filters after — so the plan is a hash join, never a
    // nested loop (PlanSpec enforces this for every registry query).
    Q("range1_events_within_hour",
      (s, d) => {
        val e = Tables.events(s, d).select(
          col("user_id"), col("event_id"), Registry.epochS(col("ts")).as("es"))
        val probe = e.withColumn("bucket", floor(col("es") / 3600))
        val build = e
          .withColumn("bucket", explode(array(
            floor(col("es") / 3600) - 1, floor(col("es") / 3600),
            floor(col("es") / 3600) + 1)))
          .select(col("user_id"), col("event_id").as("event_b"),
            col("es").as("es_b"), col("bucket"))
        probe.join(build, Seq("user_id", "bucket"))
          .filter(col("event_id") < col("event_b") &&
            abs(col("es") - col("es_b")) <= 3600)
          .select(col("user_id"), col("event_id").as("event_a"), col("event_b"))
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, ${epochSql("ts")} AS es FROM events)
             |SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b
             |FROM e a JOIN e b ON a.user_id = b.user_id
             |  AND a.event_id < b.event_id AND abs(a.es - b.es) <= 3600""".stripMargin)),

    // Custom sketch aggregate: KMV distinct-count estimate
    // (plans.KmvSketch, TypedImperativeAggregate) next to the exact count.
    // The sketch's hash and estimator are reproduced in the oracle SQL —
    // a differential-testable approximate aggregate.
    Q("sketch1_kmv_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          graft.plans.KmvSketch.distinctEstimate(col("l_partkey"), 64)
            .as("est_distinct_parts"),
          countDistinct(col("l_partkey")).as("exact_distinct")),
      Some("""WITH h AS (SELECT DISTINCT l_returnflag,
             |    ((l_partkey % 2147483647 + 2147483647) % 2147483647 * 1103515245 + 12345) % 2147483647 AS hv
             |  FROM lineitem),
             |r AS (SELECT l_returnflag, hv,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
             |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
             |  FROM h),
             |est AS (SELECT l_returnflag,
             |    CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
             |         ELSE 63.0 / (CAST(hv AS DOUBLE) / 2147483647.0) END AS est_distinct_parts
             |  FROM r WHERE rn = (CASE WHEN n < 64 THEN n ELSE 64 END)),
             |ex AS (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, est_distinct_parts, exact_distinct
             |FROM est JOIN ex USING (l_returnflag)""".stripMargin)),

    // CUBE: all grouping-set combinations in one pass.
    Q("cube_orders",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(money(col("o_totalprice"))).cast("double").as("total_price")),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // Pivot (fixed value list, so both plans stay one pass). Spark pivot
    // yields NULL for absent combos → NULLIF on the oracle side.
    Q("pivot_status",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count(),
      Some("""SELECT o_orderpriority,
             |  NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS "F",
             |  NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS "O",
             |  NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS "P"
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // Typed Dataset[T] surface (brief: case-class Encoders where type
    // safety helps): compile-time-checked fields through groupByKey/
    // mapGroups, integer-only outputs for determinism.
    Q("typed1_orders_stats",
      (s, d) => {
        import s.implicits._
        val ds = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .as[(Long, Long, String)]
        ds.groupByKey(_._3)
          .mapGroups { (status, rows) =>
            var n = 0L; var minK = Long.MaxValue; var maxK = Long.MinValue
            var custs = Set.empty[Long]
            rows.foreach { r =>
              n += 1; minK = math.min(minK, r._1); maxK = math.max(maxK, r._1)
              custs += r._2
            }
            (status, n, minK, maxK, custs.size.toLong)
          }
          .toDF("o_orderstatus", "n_orders", "min_key", "max_key", "n_custs")
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
             |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
             |  COUNT(DISTINCT o_custkey) AS n_custs
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // The same engine through the SQL-string surface: spark.sql over temp
    // views compiles to the identical Catalyst plan as the DataFrame form —
    // users of the reference's SQL workflows keep writing SQL.
    Q("sql1_pricing_summary_sql",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                |  COUNT(*) AS count_order
                |FROM graft_lineitem
                |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
                |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // Semi join — EXISTS as a first-class left_semi (never materializes
    // the right side's columns; the reference expresses EXISTS only via
    // NOT-EXISTS guards, this is the positive form).
    Q("j6_semi_join_exists",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin)),

    // Exact median via explicit window math — identical rank formula on
    // both engines, so no interpolation-mode ambiguity. Scales: windows
    // partition by the (bounded) group key.
    Q("q7_median_price_by_status",
      (s, d) => {
        val byStatus = Window.partitionBy(col("o_orderstatus"))
        val w = byStatus.orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(byStatus))
          // `div`, not `/`: Spark's / on integers is double division
          .filter(col("rn") === expr("(cnt + 1) div 2") || col("rn") === expr("(cnt + 2) div 2"))
          .groupBy(col("o_orderstatus"))
          .agg((sum(money(col("o_totalprice"))).cast("double") /
            count(lit(1)).cast("double")).as("median_price"))
      },
      Some("""WITH r AS (SELECT o_orderstatus, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS cnt
             |  FROM orders)
             |SELECT o_orderstatus,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS median_price
             |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
             |GROUP BY o_orderstatus""".stripMargin)),

    // Top-N per group: each customer's 3 largest orders — rank window +
    // filter (the distributed argmax pattern; no global sort).
    Q("q8_top_orders_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rank_in_cust", row_number().over(w))
          .filter(col("rank_in_cust") <= 3)
          .select(col("o_custkey"), col("rank_in_cust"), col("o_orderkey"),
            money(col("o_totalprice")).cast("double").as("totalprice"))
      },
      Some("""SELECT o_custkey, rank_in_cust, o_orderkey,
             |  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS totalprice
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust
             |  FROM orders) t
             |WHERE rank_in_cust <= 3""".stripMargin)),

    // q8 at scale — SAME result through the bounded top-k aggregate
    // ([[graft.plans.TopKRows]]) instead of a window. Honest scope note:
    // Spark 4 already inserts WindowGroupLimit around q8's rank filter
    // (map-side top-k per group before the exchange), so at fixture scale
    // the two forms tie (~0.56 s each at sf0.1). What the aggregate still
    // removes is BOTH sorts — WindowGroupLimit keeps a map-side sort and
    // a full reduce-side sort per partition, while the aggregate merges
    // k-bounded buffers (O(k) comparisons per row, no sort anywhere) —
    // and it composes with other aggregates in the same groupBy, which a
    // window cannot. Descending price is encoded by negating it in the
    // sort struct (the aggregate ranks ascending); o_orderkey breaks ties
    // for the total ordering the oracle demands. Hash-equal to q8's
    // window-form oracle: the plan changes, the semantics don't.
    Q("q8b_topk_agg",
      (s, d) => {
        import graft.plans.TopKRows
        val sortStruct = struct(
          negate(money(col("o_totalprice")).cast("double")).as("negprice"),
          col("o_orderkey").as("o_orderkey"))
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(TopKRows.topK(sortStruct, 3).as("tk"))
          .select(col("o_custkey"), posexplode(col("tk")))
          .select(col("o_custkey"),
            (col("pos") + 1).cast("int").as("rank_in_cust"),
            col("col.o_orderkey").as("o_orderkey"),
            negate(col("col.negprice")).as("totalprice"))
      },
      Some("""SELECT o_custkey, rank_in_cust, o_orderkey,
             |  CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS totalprice
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust
             |  FROM orders) t
             |WHERE rank_in_cust <= 3""".stripMargin)),

    // TPC-H Q13 shape: distribution of orders-per-customer, including
    // zero-order customers (left join + count of non-null keys).
    Q("q13_order_count_distribution",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist")),
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY c_custkey) t
             |GROUP BY c_count""".stripMargin)),

    // Tumbling time windows over the event stream (batch form of the
    // Structured Streaming aggregation; same plan shape).
    Q("e2_hourly_windows",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        // decimal(18,2) matches StreamingLoads.windowedEventCounts (the
        // streaming twin must stay bit-identical) and survives ANSI casts
        // for any realistic value magnitude
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(epochS(col("window.start")).as("hour_epoch"),
          col("event_type"), col("n_events"), col("total_value")),
      Some(s"""SELECT ${epochSql("date_trunc('hour', ts)")} AS hour_epoch, event_type,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Entity-resolution fuzzy match: customer-name pairs within edit
    // distance 1 via [[graft.ops.FuzzyMatch.lev1Pairs]] — exact wildcard/
    // deletion-variant blocking where the join condition itself proves the
    // distance, so NO levenshtein is ever evaluated, and never all-pairs
    // (O(n·len) variant keys). The oracle brute-forces every pair with
    // DuckDB's levenshtein — two entirely different algorithms, one
    // hash-compared answer.
    Q("er1_fuzzy_name_pairs",
      (s, d) => graft.ops.FuzzyMatch
        .lev1Pairs(Tables.customer(s, d), "c_custkey", "c_name")
        .select(col("key_a").as("cust_a"), col("key_b").as("cust_b"), col("lev")),
      Some("""SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
             |  levenshtein(a.c_name, b.c_name) AS lev
             |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
             |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin)),

    // GROUPING SETS with grouping-level tags through the SQL surface (the
    // general form behind rollup/cube): two one-column groupings plus the
    // grand total in ONE pass over orders (Spark expands to a single
    // aggregate, not three scans).
    Q("gs1_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |  grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio,
                |  COUNT(*) AS n_orders,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
                |FROM graft_orders_gs
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
             |  CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // posexplode — ordinal-preserving UNNEST (the index matters for
    // sequence data: token positions, frame numbers). Oracle pairs each
    // element with its 0-based index via a range join on the list.
    Q("a3_posexplode_words",
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          posexplode(graft.ops.Text.words(col("text"))))
        .withColumnRenamed("pos", "word_pos")
        .withColumnRenamed("col", "word"),
      Some(s"""WITH docs AS (SELECT doc_id, $docWordsSql AS ws FROM documents WHERE doc_id < 100)
             |SELECT doc_id, i - 1 AS word_pos, ws[i] AS word
             |FROM docs, unnest(range(1, len(ws) + 1)) t(i)""".stripMargin)),

    // Sessionization: 30-minute-gap sessions via lag + running flag-sum —
    // windows per user key, no global sort.
    Q("e1_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("es"), col("event_id"))
        val e = Tables.events(s, d)
          .withColumn("es", epochS(col("ts")))
          .withColumn("prev_es", lag(col("es"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_es").isNull || col("es") - col("prev_es") > 1800, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        e.groupBy(col("user_id"), col("session_id").cast("long").as("session_id"))
          .agg(count(lit(1)).as("n_events"), min(col("es")).as("session_start_epoch"))
      },
      Some(Registry.SessionizeOracleSql)),

    // Retention cohorts: users grouped by first-active week, activity
    // counted per (cohort, week offset) — the standard growth-analytics
    // triangle. Two map-side-combinable aggregations (cohort min, then
    // distinct actives) joined on the user key; week arithmetic in exact
    // epoch integers so both engines bucket identically.
    Q("e4_retention_cohorts",
      (s, d) => {
        val wk = epochS(date_trunc("week", col("ts")))
        val active = Tables.events(s, d)
          .select(col("user_id"), wk.as("week_epoch")).distinct()
        val cohort = active.groupBy(col("user_id"))
          .agg(min(col("week_epoch")).as("cohort_epoch"))
        active.join(cohort, Seq("user_id"))
          .groupBy(col("cohort_epoch"),
            ((col("week_epoch") - col("cohort_epoch")) / 604800L).cast("long").as("week_no"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      Some(s"""WITH a AS (SELECT DISTINCT user_id,
             |    ${epochSql("date_trunc('week', ts)")} AS week_epoch FROM events),
             |c AS (SELECT user_id, MIN(week_epoch) AS cohort_epoch FROM a GROUP BY 1)
             |SELECT c.cohort_epoch,
             |  CAST((a.week_epoch - c.cohort_epoch) // 604800 AS BIGINT) AS week_no,
             |  COUNT(DISTINCT a.user_id) AS n_users
             |FROM a JOIN c ON a.user_id = c.user_id
             |GROUP BY 1, 2""".stripMargin)),

    // Equi-width histogram of order values over fixed bounds (fixed →
    // one pass, no min/max pre-scan): the profiling primitive next to
    // dq1's per-column stats. Bucket arithmetic in exact integers.
    Q("hist1_order_value_histogram",
      (s, d) => Tables.orders(s, d)
        .select(least(lit(19L),
          floor(col("o_totalprice").cast("decimal(14,2)") / 30000).cast("long"))
          .as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders")),
      Some("""SELECT LEAST(19, CAST(FLOOR(CAST(o_totalprice AS DECIMAL(14,2)) / 30000) AS BIGINT)) AS bucket,
             |  COUNT(*) AS n_orders
             |FROM orders GROUP BY 1""".stripMargin)),

    // Ordered funnel: view → click → purchase, each stage's timestamp the
    // EARLIEST at-or-after the previous stage (the strict event-sequence
    // semantics product analytics needs — a purchase BEFORE the first
    // view does not count). Three grouped mins chained by per-user joins;
    // every join is an equi hash join on user_id, no window over the raw
    // event stream.
    Q("e3_funnel_stages",
      (s, d) => {
        val ev = Tables.events(s, d).select(
          col("user_id"), col("event_type"), epochS(col("ts")).as("es"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("es")).as("t_view"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("es") >= col("t_view"))
          .groupBy("user_id").agg(min(col("es")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("es") >= col("t_click"))
          .groupBy("user_id").agg(min(col("es")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
            (lit(1) +
              when(col("t_click").isNotNull, 1).otherwise(0) +
              when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
      },
      Some(s"""WITH e AS (SELECT user_id, event_type, ${epochSql("ts")} AS es FROM events),
             |v AS (SELECT user_id, MIN(es) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, MIN(es) AS t_click FROM e JOIN v ON e.user_id = v.user_id
             |      WHERE event_type = 'click' AND es >= t_view GROUP BY 1),
             |p AS (SELECT e.user_id, MIN(es) AS t_purchase FROM e JOIN c ON e.user_id = c.user_id
             |      WHERE event_type = 'purchase' AND es >= t_click GROUP BY 1)
             |SELECT v.user_id, t_view, t_click, t_purchase,
             |  1 + (CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
             |    + (CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stage
             |FROM v LEFT JOIN c ON v.user_id = c.user_id
             |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin)),

    // Data-quality profile: per-column null count / distinct count /
    // min / max over orders in ONE pass — unpivot to (column, value)
    // rows, then a single grouped aggregation (one shuffle, one
    // countDistinct per group — no N-column expand). Values compare as
    // canonical strings; doubles go through DECIMAL(14,2) so both
    // engines render identical fixed-point text.
    Q("dq1_profile",
      (s, d) => {
        val o = Tables.orders(s, d)
        val profiled = Seq(
          "o_orderstatus" -> col("o_orderstatus").cast("string"),
          "o_orderpriority" -> col("o_orderpriority").cast("string"),
          "o_custkey" -> col("o_custkey").cast("string"),
          "o_orderdate" -> date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
          "o_totalprice" -> Registry.money(col("o_totalprice")).cast("string"))
        o.select(explode(array(profiled.map { case (n, c) =>
            struct(lit(n).as("column_name"), c.as("v")) }: _*)).as("e"))
          .select(col("e.column_name").as("column_name"), col("e.v").as("v"))
          .groupBy("column_name")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col("v")).as("n_distinct"),
            min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      },
      Some("""WITH u AS (
             |  SELECT 'o_orderstatus' AS column_name, CAST(o_orderstatus AS VARCHAR) AS v FROM orders
             |  UNION ALL SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
             |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
             |  UNION ALL SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') FROM orders
             |  UNION ALL SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) FROM orders)
             |SELECT column_name, COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  COUNT(DISTINCT v) AS n_distinct,
             |  MIN(v) AS min_v, MAX(v) AS max_v
             |FROM u GROUP BY 1""".stripMargin))) ++ tpchCompletion

  /** The five TPC-H shapes the registry didn't yet cover — q2, q4, q12,
    * q16, q21 — adapted to the synthetic schema (no partsupp /
    * l_commitdate / l_receiptdate / l_shipmode columns exist; lineitem
    * stands in for the offer list and `l_returnflag = 'R'` is the
    * "late/failed" proxy). With these the registry exercises all 22
    * TPC-H query shapes.
    */
  private def tpchCompletion: Seq[Q] = Seq(

    // TPC-H Q2 shape: per-group argmin against a correlated minimum,
    // reached through a supplier→nation→region dim chain. Both sides
    // compute min over the exact DECIMAL price, so `price = min_price`
    // is engine-portable (same reasoning as q15's argmax). The dim chain
    // and the qualifying-part filter broadcast; the min join reuses the
    // per-part aggregation — at 100 TB the only wide exchange is the
    // per-part groupBy of the (already supplier-pruned) lineitem.
    Q("q2_min_cost_supplier",
      (s, d) => {
        val supEurope = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        val offers = Tables.lineitem(s, d)
          .join(broadcast(supEurope), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey"), col("s_name"), col("s_acctbal"), col("n_name"),
            money(col("l_extendedprice")).as("price"))
        val minPrice = offers.groupBy(col("l_partkey")).agg(min(col("price")).as("min_price"))
        offers.join(minPrice, Seq("l_partkey"))
          .filter(col("price") === col("min_price"))
          .join(broadcast(Tables.part(s, d).filter(col("p_size") === 15)),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
            col("s_acctbal"), col("min_price").cast("double").as("min_price"))
          .distinct()
      },
      Some("""WITH o AS (
             |  SELECT l_partkey, s_name, s_acctbal, n_name,
             |         CAST(l_extendedprice AS DECIMAL(14,2)) AS price
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |m AS (SELECT l_partkey, MIN(price) AS min_price FROM o GROUP BY 1)
             |SELECT DISTINCT p_partkey, p_name, s_name, n_name, s_acctbal,
             |       CAST(m.min_price AS DOUBLE) AS min_price
             |FROM o JOIN m ON o.l_partkey = m.l_partkey
             |JOIN part ON o.l_partkey = p_partkey
             |WHERE p_size = 15 AND o.price = m.min_price""".stripMargin)),

    // TPC-H Q4 shape: EXISTS → left-semi join, then count by priority.
    // The semi join shuffles both sides on the order key (no payload
    // columns cross the exchange); the 5-key aggregation is map-side.
    Q("q4_priority_order_check",
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
            col("o_orderdate").cast("date") < lit("1996-04-01").cast("date"))
        val returned = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             |FROM orders
             |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
             |  AND CAST(o_orderdate AS DATE) <  DATE '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |GROUP BY 1""".stripMargin)),

    // TPC-H Q12 shape: big-big equi-join + conditional (CASE) counts
    // over a bounded group key (l_returnflag stands in for l_shipmode).
    // Both sides shuffle on the order key; at 100 TB neither side
    // broadcasts and AQE picks the hash side.
    Q("q12_priority_by_returnflag",
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
            col("l_shipdate").cast("date") < lit("1997-01-01").cast("date"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             |  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
             |GROUP BY 1""".stripMargin)),

    // TPC-H Q16 shape: NOT IN exclusion subquery (suppliers with
    // negative balance stand in for "customer complaints") + grouped
    // COUNT(DISTINCT supplier). Supplier keys are non-null, so the
    // anti join is semantics-identical to NOT IN. lineitem is the
    // partsupp stand-in; the part slice and the exclusion list both
    // broadcast.
    Q("q16_supplier_part_counts",
      (s, d) => {
        val excl = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
              .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 5, 9, 15, 23))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,15,23)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3""".stripMargin)),

    // TPC-H Q21 shape: the sole-failing-supplier query. The oracle keeps
    // the canonical EXISTS + NOT EXISTS self-join form; the Spark side
    // folds both correlated subqueries into ONE grouped pass over
    // lineitem — countDistinct(supplier) answers EXISTS-other-supplier,
    // countDistinct(failing supplier) answers NOT-EXISTS-other-failer,
    // and max(failing supplier) recovers the unique culprit. Two
    // self-join shuffles of the fact table become a single aggregation —
    // at 100 TB that is 3× less lineitem through the wire.
    Q("q21_sole_returning_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
          (col("l_returnflag") === "R").as("fail"))
        // Two-level aggregation instead of multi-countDistinct: the
        // distinct-rewrite would Expand every lineitem row 3× before the
        // shuffle; deduping (order, supplier) first keeps the wire volume
        // at 1× and both levels keep map-side partial aggregation.
        val perOrderSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("fail")).as("fail"))
        val perOrder = perOrderSupp.groupBy(col("l_orderkey")).agg(
          count(lit(1)).as("nsupp"),
          sum(when(col("fail"), 1L).otherwise(0L)).as("nfail"),
          max(when(col("fail"), col("l_suppkey"))).as("fail_supp"))
        perOrder.filter(col("nsupp") > 1 && col("nfail") === 1)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(broadcast(Tables.supplier(s, d)), col("fail_supp") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
      },
      Some("""SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
             |FROM lineitem l1
             |JOIN supplier ON l1.l_suppkey = s_suppkey
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |GROUP BY 1""".stripMargin)),

    // Z-order (Morton) clustering key — the multi-column file-skipping
    // layout ([[graft.ops.ZOrder]]; writeZOrdered range-writes on this
    // value so every file is one small 2-D tile and min/max stats prune
    // on EITHER column). The oracle rebuilds the identical interleave
    // with explicit shift/mask terms in DuckDB — bit-for-bit.
    Q("zorder1_morton_keys",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        graft.ops.ZOrder.zValue(
          Seq(pmod(col("o_custkey"), lit(1024L)),
            pmod(col("o_orderkey"), lit(1024L))), bits = 10).as("zval")),
      Some {
        val terms = (0 until 10).flatMap(i => Seq(
          s"((((o_custkey % 1024) >> $i) & 1) << ${i * 2})",
          s"((((o_orderkey % 1024) >> $i) & 1) << ${i * 2 + 1})"))
        s"SELECT o_orderkey, CAST(${terms.mkString(" | ")} AS BIGINT) AS zval FROM orders"
      }),

    // Bloom-filter join pruning ([[graft.ops.BloomPrune]]): a selective
    // build side (urgent high-value orders) blooms its keys; the lineitem
    // probe side drops non-candidates BEFORE its shuffle. No false
    // negatives ⇒ bloom + exact join ≡ exact join — the oracle runs the
    // PLAIN join, so the hash match proves the prefilter is lossless.
    Q("bf1_bloom_pruned_join",
      (s, d) => {
        val sel = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 200000)
          .select(col("o_orderkey"))
        val pruned = graft.ops.BloomPrune.prunedByBloom(
          Tables.lineitem(s, d), col("l_orderkey"), sel, col("o_orderkey"),
          expectedItems = 100000L, numBits = 1L << 20)
        pruned.join(sel, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(Registry.money(col("l_extendedprice"))).cast("double").as("revenue"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
             |GROUP BY 1""".stripMargin)),

    // Delta Lake interop ([[graft.ops.DeltaInterop]]): commit `documents`
    // through the versioned commit log, then read it back EXACTLY the way
    // an external Delta engine would — the `_delta_log` written at commit
    // time (protocol/metaData/add actions, open published format), not a
    // directory listing, decides which files to read and what schema types
    // them. Hash-matching the oracle (which reads the ORIGINAL parquet)
    // proves every committed snapshot is externally readable in place —
    // zero data copies, zero export jobs.
    Q("io1_delta_log_roundtrip",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("io1_delta")
        val table = dir.resolve("documents")
        try {
          val v = graft.ops.Storage.commitVersion(Tables.documents(s, d), table)
          graft.ops.DeltaInterop.readSnapshot(s, table.resolve(s"v$v"))
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).cast("long").as("sum_chars"))
            // materialize before the temp table is deleted below (the
            // returned frame is otherwise lazy over the temp files)
            .localCheckpoint()
        } finally graft.ops.Storage.deleteRecursively(dir)
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY 1""".stripMargin)))
}

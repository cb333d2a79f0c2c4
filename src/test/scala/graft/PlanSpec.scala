package graft

import graft.queries.Registry

/** Physical-plan shape assertions — the 100 TB guarantees (SURVEY.md §4):
  * filters reach the parquet scan, bounded dims broadcast, the J5
  * disjunctive-join rewrite actually hash-joins, and nothing degrades to a
  * nested-loop join anywhere in the registry.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    Registry.all.find(_.name == name).get
      .fn(spark, Sf001).queryExecution.executedPlan.toString

  test("q1: ship-date filter is pushed to the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") || p.contains("PushedFilters: [*"),
      s"no pushdown in:\n$p")
  }

  test("q1: scan reads only the needed columns") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"over-wide scan: $readSchema")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
  }

  test("corpus queries: the documents scan is pruned to exactly the needed columns") {
    // map-only per-doc metrics need (doc_id, text) and nothing else; a
    // scan dragging lang/source/n_chars through a 100 TB corpus is wrong
    for (q <- Seq("t1_token_stats", "t6_repetition_metrics", "t7_pii_redaction",
        "fp1_winnowing", "d9_chunk_dedup")) {
      val schemas = plan(q).linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
      assert(!schemas.contains("lang") && !schemas.contains("source") &&
        !schemas.contains("n_chars"), s"$q over-wide scan:\n$schemas")
      assert(schemas.contains("text"), s"$q missing text column:\n$schemas")
    }
    // s8 needs only (doc_id, lang)
    val s8 = plan("s8_stratified_sample").linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(!s8.contains("text") && s8.contains("lang"), s"s8 scan:\n$s8")
  }

  test("q6: date-cast comparison still pushes a timestamp range to the scan") {
    // `cast(ts AS DATE) >= lit` must not block pushdown — Catalyst
    // rewrites it to a timestamp range (OptimizeCastsOnDatetimeFields);
    // at 100 TB a cast-blocked scan filter reads the whole table
    val p = plan("q6_forecast_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), " +
      "IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda"),
      s"q6 predicates not pushed:\n$p")
  }

  test("j2: dimension joins are broadcast hash joins") {
    val p = plan("j2_fk_resolution")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join for bounded dims:\n$p")
  }

  test("j5: unknown-member join is a hash join, NOT a nested-loop join") {
    val p = plan("j5_unknown_member_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"),
      s"equi-rewrite failed to produce a hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"disjunctive join degraded to nested loop:\n$p")
  }

  test("no query in the registry plans a nested-loop join (except the 1-row ANN query seed)") {
    // cross-join against a SINGLE-ROW broadcast (the ANN query vector, a
    // global-aggregate scalar) is the one legitimate BNLJ shape — the
    // "loop" runs over one row; everything else must hash-join
    val allowed = Set("sim1_cosine_topk", "sim2_lsh_topk", "sim4_ivf_topk",
      "sim6_ivfpq_topk", "sim8_batched_topk", // bounded query micro-batch
      "q22_dormant_rich_customers", "q11_important_parts", "q15_top_supplier",
      "tfidf1_top_terms", "mix1_mixture_weights")
    BuiltQueries.all(spark, Sf001).filterNot(q => allowed(q._1)).foreach {
      case (name, df) =>
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"$name plans a nested-loop/cartesian join:\n$p")
    }
  }

  test("sim8: the batched top-k prunes per-query rank BEFORE the shuffle (WindowGroupLimit)") {
    // the serving-shape guarantee: with Q queries over n vectors, the
    // exchange must move O(tasks·Q·k) locally-ranked rows, not the n·Q
    // score matrix — Catalyst's InferWindowGroupLimit turns the
    // row_number ≤ k filter into a partial WindowGroupLimit on the map
    // side; if this operator disappears, sim8 silently shuffles the
    // whole score matrix at 100 TB
    val p = plan("sim8_batched_topk")
    assert(p.contains("WindowGroupLimit"), s"rank limit not pushed below the shuffle:\n$p")
    val schemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!schemas.contains("label"), s"sim8 over-wide scan:\n$schemas")
  }

  test("j4: incremental load is a first-class anti join") {
    val p = plan("j4_incremental_antijoin")
    assert(p.contains("LeftAnti"), s"no anti join in:\n$p")
  }

  test("pipe2: the composed domain star stays on broadcast hash joins end to end") {
    // dims (bounded) broadcast into the fact build; the disjunctive
    // unknown-member join must take the synthetic-equi-key hash path;
    // nothing in the 10-join pipeline may degrade to a shuffle-sort or
    // nested-loop join, and the only windows are the keyed per-partition
    // SK windows
    val p = plan("pipe2_domain_star")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"domain star degraded from broadcast hash joins:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition funnel in the domain star:\n$p")
  }

  test("no query plans a partition-unbounded window (except the global-SK baseline)") {
    // a Window with an empty partition spec funnels the whole input
    // through ONE task — the bulk-load anti-pattern withScalableSk
    // exists to kill. m5_surrogate_keys keeps the global form
    // deliberately as the bounded-dim baseline its scalable twin (m5b)
    // is hash-compared against.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val allowed = Set("m5_surrogate_keys")
    BuiltQueries.all(spark, Sf001).filterNot(q => allowed(q._1)).foreach {
      case (name, df) =>
        val global = df.queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        assert(global.isEmpty,
          s"$name plans a partition-unbounded window: ${global.mkString(";")}")
    }
  }

  test("m7: the merge join reuses the rollups' partitioning (one exchange per side)") {
    // the delta-merge join runs on the same keys both sides just
    // aggregated by; with plain-equality keys the join inherits their
    // hash partitioning, so the ONLY exchanges are the two aggs' own —
    // a <=> join would re-shuffle both sides on coalesced key tuples
    val p = plan("m7_incremental_agg")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"delta-merge join re-shuffles its inputs:\n$p")
  }

  test("aggregations are partial (map-side combine) before the shuffle") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair implies map-side combine
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial aggregation:\n$p")
  }

  test("whole-stage codegen covers the q1 scan+filter+aggregate path") {
    // AQE only annotates codegen stages in the FINAL plan — materialize first
    val df = Registry.all.find(_.name == "q1_pricing_summary").get.fn(spark, Sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in the final AQE plan
    assert(p.contains("*(1)"), s"no codegen spans:\n$p")
  }
}

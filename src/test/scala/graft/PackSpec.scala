package graft

import graft.ops.Corpus
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackSpec extends SparkTestBase {
  import spark.implicits._

  test("pack: two-phase packing equals the single-window formulation") {
    val docs = (1 to 257).map(i => (i.toLong, (i * 2654435761L % 37).toInt))
      .toDF("id", "n")
    val fast = Corpus.packSequences(docs, "id", "n", seqLen = 64, partitions = 7)
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    val slow = docs
      .withColumn("cb", coalesce(sum($"n".cast("long")).over(w), lit(0L)))
      .select($"id", $"n".cast("long").as("n"),
        when($"n" > 0, expr("cb div 64L")).as("first_seq"),
        when($"n" > 0, expr("(cb + n - 1) div 64L")).as("last_seq"))
      .withColumn("n_seqs", coalesce($"last_seq" - $"first_seq" + 1, lit(0L)))
    assert(fast.collect().toSet == slow.collect().toSet)
  }

  test("pack: consecutive docs tile the sequence space without gaps") {
    val docs = Seq((1L, 10), (2L, 0), (3L, 64), (4L, 1), (5L, 200)).toDF("id", "n")
    val out = Corpus.packSequences(docs, "id", "n", seqLen = 64)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 10L, Some(0L), Some(0L), 1L),   // tokens 0..9
      (2L, 0L, None, None, 0L),            // empty doc spans nothing
      (3L, 64L, Some(0L), Some(1L), 2L),   // tokens 10..73 straddles seq 0/1
      (4L, 1L, Some(1L), Some(1L), 1L),    // token 74
      (5L, 200L, Some(1L), Some(4L), 4L))) // tokens 75..274
  }

  test("tokenBudgetSample: greedy prefix, budget-crossing doc included, partition-invariant") {
    // order (longest first, id tie-break): 1(5), 2(5), 3(4), 4(1)
    // cum_before:                          0     5     10    14
    val docs = Seq((1L, 5L), (2L, 5L), (3L, 4L), (4L, 1L)).toDF("doc_id", "n_words")
      .withColumn("neg", -col("n_words"))
    def run(budget: Long, parts: Int) =
      Corpus.tokenBudgetSample(docs.repartition(parts), Seq("neg", "doc_id"), "n_words", budget)
        .collect().map(_.getLong(0)).toSet
    assert(run(10L, 1) == Set(1L, 2L), "cum_before = budget is past the budget")
    // doc 3 CROSSES the 12-token budget (10 < 12 but 10+4 > 12) — included
    assert(run(12L, 1) == Set(1L, 2L, 3L))
    assert(run(12L, 5) == run(12L, 1), "selection must not depend on partitioning")
    assert(run(0L, 3) == Set.empty)
  }
}

package graft

import graft.ops.FuzzyMatch
import org.apache.spark.sql.functions._

class FuzzyMatchSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)]): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ka, sa) <- rows; (kb, sb) <- rows
      if ka < kb && lev(sa, sb) <= 1
    } yield (ka, kb, lev(sa, sb))).toSet
  }

  test("lev1Pairs: substitution / insert / delete / equal cases match brute force") {
    val rows = Seq(
      1L -> "spark", 2L -> "shark",   // substitution
      3L -> "sparks",                 // insert vs 1
      4L -> "park",                   // delete vs 1
      5L -> "spark",                  // exact dup of 1
      6L -> "flink",                  // unrelated
      7L -> "aa", 8L -> "aaa",        // adjacent identical chars (indel dedup)
      9L -> "a b", 10L -> "axb",      // space in data must not confuse the mask
      11L -> "ab", 12L -> "ba",       // transposition = lev 2, must be absent
      13L -> "", 14L -> "",           // empty strings: lev 0 pair, no phantom variants
      15L -> "x")                     // single char: lev 1 to the empties
    val out = FuzzyMatch.lev1Pairs(rows.toDF("k", "s"), "k", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == brute(rows))
  }

  test("lev1Pairs on real customer names matches brute-force levenshtein") {
    val c = Tables.customer(spark, Sf001).limit(200)
    val rows = c.select($"c_custkey", $"c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val out = FuzzyMatch.lev1Pairs(c, "c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == brute(rows))
  }
}

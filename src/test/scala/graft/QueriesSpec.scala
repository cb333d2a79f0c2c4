package graft

import graft.queries.Registry

class QueriesSpec extends SparkTestBase {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs at sf0.001 and most return rows") {
    // j3 (customers without orders) is legitimately empty at sf0.001;
    // sub2 returns zero rows BY DESIGN (NOT IN over a NULL-bearing list);
    // d3 is the banding-recall INVARIANT — empty IS the correct answer
    val mayBeEmpty = Set("j3_customers_without_orders",
      "sub2_not_in_null_semantics", "d3_minhash_lsh_recall")
    BuiltQueries.all(spark, Sf001).foreach { case (name, df) =>
      val n = df.count()
      assert(n >= 0, name)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracle names are a subset of query names and non-empty") {
    val qn = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qn))
    assert(SparkEntry.oracleSql.nonEmpty)
  }

  test("query outputs have no duplicate column names (driver hash safety)") {
    BuiltQueries.all(spark, Sf001).foreach { case (name, df) =>
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"$name: ${cols.mkString(",")}")
    }
  }
}

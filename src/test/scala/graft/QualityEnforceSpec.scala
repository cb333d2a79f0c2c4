package graft

import graft.ops.Quality
import org.apache.spark.sql.functions._

/** Write-time constraint enforcement: violating batches throw BEFORE any
  * commit, with every violated constraint reported at once. */
class QualityEnforceSpec extends SparkTestBase {

  private def df(rows: (java.lang.Long, java.lang.Long, java.lang.Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "fk", "amt")
  }

  test("a clean batch passes through unchanged; a dirty one reports EVERY violated constraint") {
    val clean = df((1L, 10L, 5.0), (2L, 20L, 7.5))
    assert(Quality.enforce(clean,
      notNull = Seq("fk"),
      checks = Map("positive_amt" -> (col("amt") > 0)),
      uniqueKey = Seq("k")).collect().length == 2)

    val dirty = df((1L, null, 5.0), (1L, 20L, -3.0), (2L, 30L, 1.0))
    val e = intercept[Quality.ConstraintViolation] {
      Quality.enforce(dirty,
        notNull = Seq("fk"),
        checks = Map("positive_amt" -> (col("amt") > 0)),
        uniqueKey = Seq("k"))
    }
    // one pass reports all three families, with counts
    assert(e.getMessage.contains("NOT NULL fk: 1"), e.getMessage)
    assert(e.getMessage.contains("CHECK positive_amt: 1"), e.getMessage)
    assert(e.getMessage.contains("UNIQUE (k): 1"), e.getMessage)
  }

  test("a CHECK evaluating NULL is a violation (strict), coalesce opts out") {
    val d = df((1L, 10L, null))
    intercept[Quality.ConstraintViolation] {
      Quality.enforce(d, checks = Map("positive_amt" -> (col("amt") > 0)))
    }
    // explicit opt-out: treat NULL amt as acceptable
    assert(Quality.enforce(d,
      checks = Map("positive_amt" ->
        coalesce(col("amt") > 0, lit(true)))).count() == 1)
  }
}

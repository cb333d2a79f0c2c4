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

  test("enforcedCommit rejects an orphan-FK batch pre-commit; NULL fk is a non-reference, allowed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fk_enforce")
    val table = dir.resolve("child")
    try {
      val parent = Seq(10L, 20L, 30L).toDF("pid")
      // clean: every non-null fk resolves; the NULL is SQL's no-reference
      val clean = df((1L, 10L, 5.0), (2L, 20L, 7.5), (3L, null, 1.0))
      val v = Quality.enforcedCommit(clean, table,
        notNull = Seq("amt"), uniqueKey = Seq("k"),
        foreignKeys = Seq(Quality.ForeignKey("child_parent", "fk", parent, "pid")))
      assert(v == 0L)
      assert(graft.ops.Storage.readVersion(spark, table).count() == 3)

      // an orphan SK (99 has no parent) must be rejected BEFORE commit
      val orphan = df((4L, 99L, 2.0))
      val e = intercept[Quality.ConstraintViolation] {
        Quality.enforcedCommit(orphan, table,
          foreignKeys = Seq(Quality.ForeignKey("child_parent", "fk", parent, "pid")))
      }
      assert(e.getMessage.contains("FOREIGN KEY child_parent"), e.getMessage)
      assert(e.getMessage.contains("1 orphaned key(s)"), e.getMessage)
      // the table still serves the clean state — nothing landed
      assert(graft.ops.Storage.currentVersion(table).contains(0L))
      assert(graft.ops.Storage.readVersion(spark, table).count() == 3)
    } finally graft.ops.Storage.deleteRecursively(dir)
  }

  test("enforcedCommit scans the source exactly once; validation and commit see the same rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("once_enforce")
    val table = dir.resolve("t")
    try {
      // every row evaluation is OBSERVABLE through an accumulator: the
      // old enforce+commit path scanned the source three times — agg
      // pass, unique probe, commit write — so a non-deterministic source
      // could validate one set of rows yet commit another. The witness
      // here is the evaluation count: exactly one pass.
      val evals = spark.sparkContext.longAccumulator("source_evals")
      val src = spark.range(0, 100, 1, 4).rdd.mapPartitionsWithIndex { (pid, it) =>
        var local = 0L
        it.map { _ => evals.add(1L); local += 1; pid * 1000L + local }
      }.toDF("k")
      val v = Quality.enforcedCommit(src, table,
        notNull = Seq("k"),
        checks = Map("positive" -> (col("k") > 0)),
        uniqueKey = Seq("k"))
      assert(v == 0L)
      assert(evals.value == 100L,
        s"the source must be scanned exactly once, saw ${evals.value} row evaluations")
      val committed = graft.ops.Storage.readVersion(spark, table)
        .select("k").collect().map(_.getLong(0)).toSet
      assert(committed == (0 until 4).flatMap(p => (1L to 25L).map(p * 1000L + _)).toSet)
    } finally graft.ops.Storage.deleteRecursively(dir)
  }
}

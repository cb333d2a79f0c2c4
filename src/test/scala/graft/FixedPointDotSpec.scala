package graft

import graft.ops.Similarity
import graft.plans.FixedPointDot
import org.apache.spark.sql.functions._

class FixedPointDotSpec extends SparkTestBase {

  test("codegen'd FixedPointDot equals the HOF fold on every real embedding") {
    val e = Tables.embeddings(spark, Sf001)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q)).select(
      col("vec_id"),
      Similarity.dotUnitsHof(col("embedding"), col("qe")).cast("string").as("hof"),
      FixedPointDot.dot(col("embedding"), col("qe")).cast("string").as("fused"))
    assert(both.filter(col("hof") =!= col("fused")).count() == 0)
    // and for self-dots (squares exercise the carry path more)
    val selfs = e.select(
      Similarity.dotUnitsHof(col("embedding"), col("embedding")).cast("string").as("hof"),
      FixedPointDot.dot(col("embedding"), col("embedding")).cast("string").as("fused"))
    assert(selfs.filter(col("hof") =!= col("fused")).count() == 0)
  }

  test("negative accumulations: anti-parallel vectors give exact negated self-dot") {
    import spark.implicits._
    val v = Seq(0.5, -0.25, 0.125, -0.999999)
    val df = Seq((v, v.map(-_))).toDF("a", "b")
    val r = df.select(
      FixedPointDot.dot(col("a"), col("a")).as("aa"),
      FixedPointDot.dot(col("a"), col("b")).as("ab")).head()
    assert(r.getDecimal(0).negate() == r.getDecimal(1))
  }

  test("dirty inputs yield NULL, matching the HOF formulation — never a truncated value") {
    import spark.implicits._
    val df = Seq(
      (Seq(Some(1.0), Some(2.0)), Seq(Some(1.0), Some(2.0)), false), // clean
      (Seq(Some(1.0), Some(2.0)), Seq(Some(1.0)), true),             // dim mismatch
      (Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)), true)        // NULL element
    ).toDF("a", "b", "expect_null")
    val bad = df.filter(
      FixedPointDot.dot(col("a"), col("b")).isNull =!= col("expect_null")).count()
    assert(bad == 0)
    // and the fused expression still agrees with the HOF fold on dirty data
    val diff = df.filter(
      !(FixedPointDot.dot(col("a"), col("b")) <=>
        graft.ops.Similarity.dotUnitsHof(col("a"), col("b")).cast("decimal(28,0)"))).count()
    assert(diff == 0)
  }
}

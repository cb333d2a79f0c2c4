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
}

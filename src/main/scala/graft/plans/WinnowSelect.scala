package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection as a native codegen'd Expression:
  * input array<long> of gram hashes, output
  * array<struct<pos:long, fph:long>> — the distinct (1-based position,
  * hash) pairs selected by the MOSS rightmost-min-per-window rule.
  *
  * Why native (the measured chain, sf0.1, 250k grams): the column-lambda
  * formulation runs INTERPRETED — higher-order functions have no
  * codegen — and even after staging projections and replacing the
  * per-window struct fold with per-position neighbor-run arithmetic it
  * floored at ~3 s; ~2.4 s of that was interpreted expression-tree
  * walking. This expression runs the textbook O(n) amortized rolling
  * rightmost-min over a primitive long[] (0.3 s end to end) — the same
  * reason [[FixedPointDot]] exists for the similarity path.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"window must be >= 1 (got $w)")

  override def dataType: DataType = WinnowSelect.OutType

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = WinnowSelect.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.select($c, $w);"
    })
}

object WinnowSelect {

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fph", LongType, nullable = false))), containsNull = false)

  /** Rolling rightmost-min winnowing (Schleimer et al. §5): the previous
    * window's pick is reused while it stays in range; a rescan happens
    * only when it slides out — O(n) amortized, one pass, primitive
    * longs. `<=` on the new entrant keeps the RIGHTMOST minimum on
    * ties, matching the SQL oracle's list_position(list_reverse(...)). */
  def select(g: ArrayData, w: Int): ArrayData = {
    val n = g.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val h = g.toLongArray()
    val win = math.min(w, n)
    val selected = new Array[Boolean](n)
    var best = -1
    var wi = 0
    while (wi + win <= n) {
      if (best < wi) {
        best = wi
        var k = wi + 1
        while (k < wi + win) { if (h(k) <= h(best)) best = k; k += 1 }
      } else {
        val last = wi + win - 1
        if (h(last) <= h(best)) best = last
      }
      selected(best) = true
      wi += 1
    }
    val out = Array.newBuilder[Any]
    var j = 0
    while (j < n) {
      if (selected(j))
        out += new GenericInternalRow(Array[Any]((j + 1).toLong, h(j)))
      j += 1
    }
    new GenericArrayData(out.result())
  }

  val FnName = "graft_winnow_select"

  /** Column API via the session function registry (the supported route
    * from api-level Column to a custom Expression in Spark 4). */
  def apply(grams: Column, w: Int): Column = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val spark = castToImpl(org.apache.spark.sql.SparkSession.active)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => WinnowSelect(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    org.apache.spark.sql.functions.call_function(
      FnName, grams, org.apache.spark.sql.functions.lit(w))
  }
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, FloatType}

/** Fused fixed-point dot product — the engine's one custom codegen'd
  * Catalyst Expression.
  *
  * Semantically identical to [[graft.ops.Similarity.dotUnits]] (elements
  * quantized to 1e-10 units via floor, products summed exactly), but as a
  * single tight loop instead of `aggregate(zip_with(...))`: the
  * higher-order-function fold allocates a Decimal per element and cannot
  * participate in whole-stage codegen. Here products accumulate in a
  * two-long 128-bit integer (Math.multiplyHigh is a JIT intrinsic on
  * JDK 17); one Decimal materializes per ROW, not per element.
  *
  * Value bound: |element| < 10⁹ after the 1e10 scaling per unit-ish
  * embedding values keeps each product < 2¹²⁷/d for any realistic
  * dimension; the 128-bit accumulator cannot overflow before ~10¹⁸
  * elements.
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DecimalType(28, 0)

  // can yield NULL even for non-null inputs (dimension mismatch / NULL
  // element) — without this the optimizer would assume non-null outputs
  // for non-null children and miscompile the guard away
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    FixedPointDot.dotUnitsOrNull(x, y, leftIsFloat, rightIsFloat)
  }

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == FloatType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val cls = FixedPointDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $cls.dotUnitsOrNull($xa, $ya, $leftIsFloat, $rightIsFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
}

object FixedPointDot {

  private val Scale = 1e10

  /** 128-bit exact unit-product sum; shared by eval and generated code.
    * NULL (not a truncated value) for mismatched dimensions or NULL
    * elements — matching the reference `aggregate(zip_with(...))`
    * formulation, where zip_with pads the shorter side with NULLs and the
    * fold nulls out. A silently-truncated dot over mixed embedding models
    * (a bad upstream join) would be a plausible-looking wrong answer. */
  def dotUnitsOrNull(x: ArrayData, y: ArrayData,
      leftFloat: Boolean, rightFloat: Boolean): Decimal = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val u = math.floor(xv * Scale).toLong
      val v = math.floor(yv * Scale).toLong
      val pLo = u * v
      val pHi = Math.multiplyHigh(u, v)
      val nLo = lo + pLo
      hi += pHi + (if (java.lang.Long.compareUnsigned(nLo, lo) < 0) 1L else 0L)
      lo = nLo
      i += 1
    }
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(new java.math.BigDecimal(bi), 28, 0)
  }

  val FnName = "graft_fixed_point_dot"

  /** Register-ONCE-then-call via the active session's function registry —
    * the supported route from the api-level Column to a custom Expression
    * in Spark 4, shared by every graft registry-routed function. The
    * existence probe keeps re-entry silent: an unconditional
    * createOrReplaceTempFunction logs a "replaced a previously registered
    * function" warning on every call after the first, which spammed each
    * bench tail. Names are 1:1 with their builder (k-parameterized names
    * embed k), so an already-registered name IS the same function and
    * skipping the re-register never changes behavior; the benign race of
    * two first-callers both registering resolves to identical entries. */
  private[graft] def viaRegistry(name: String,
      mk: Seq[Expression] => Expression, args: Column*): Column = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val spark = castToImpl(org.apache.spark.sql.SparkSession.active)
    val id = new org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, mk, "built-in")
    org.apache.spark.sql.functions.call_function(name, args: _*)
  }

  /** Column API: [[viaRegistry]] on [[FnName]]. */
  def dot(a: Column, b: Column): Column =
    viaRegistry(FnName, exprs => FixedPointDot(exprs(0), exprs(1)), a, b)
}

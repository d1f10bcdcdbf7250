package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd dot product of two `array<bigint>` columns — the hot-loop
  * primitive under every exact-cosine operator (t5/t11/t26/t35/t57 and
  * the PQ/ADC family's refine stage).
  *
  * Why a native Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions DON'T participate in whole-stage codegen —
  * each evaluation walks a lambda interpreter and materializes the
  * intermediate zipped array, which is exactly the per-pair constant a
  * brute-force block (2.5·10⁹ pairs at t57's ×100 point) multiplies.
  * This expression compiles to a primitive long loop inside the
  * generated stage: no lambda dispatch, no allocation. Preference
  * order per the engine charter: compose built-ins where semantics
  * allow → NATIVE EXPRESSION WITH doGenCode (here) → never a UDF.
  *
  * Semantics: Σᵢ a[i]·b[i] over the common prefix length, as exact
  * long arithmetic (the 1e6-grid scaled vectors make every product and
  * the sum integer-exact; long addition is associative so order
  * carries no float hazard). Null ARRAYS propagate null (standard
  * BinaryExpression null-intolerance); array ELEMENTS are assumed
  * non-null — every producer ([[graft.queries.VectorQueries]] scaleL)
  * emits dense arrays. Registered as SQL `long_dot` via
  * [[GraftExtensions]]. ImplicitCastInputTypes pins both inputs to
  * `array<bigint>` at ANALYSIS time: `long_dot(array(1,2), …)` (int
  * literals → array<int>) is coerced rather than hitting getLong's
  * ClassCastException in interpreted eval — or, worse, silently wrong
  * byte offsets under codegen over UnsafeArrayData. */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LongArrayDot = copy(left = l, right = r)

  override def prettyName: String = "long_dot"
}

/** Codegen'd squared L2 distance Σᵢ (a[i]−b[i])² of two `array<bigint>`
  * columns — the Lloyd E-step / PQ-encode primitive
  * ([[graft.ops.KMeans]]), same rationale and null semantics as
  * [[LongArrayDot]]. One fused loop instead of three dots (‖a‖² −
  * 2a·b + ‖b‖²) or an interpreted `zip_with` lambda. Registered as SQL
  * `long_distsq`. Inputs analysis-pinned to `array<bigint>` like
  * [[LongArrayDot]]. */
case class LongArrayDistSq(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $x.getLong($i) - $y.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LongArrayDistSq = copy(left = l, right = r)

  override def prettyName: String = "long_distsq"
}

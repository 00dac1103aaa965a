package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * The declarative form — `aggregate(zip_with(a, b, (x, y) => x * y),
  * 0.0, (acc, x) => acc + x)` — is the oracle-documented semantics but
  * every higher-order function in it is `CodegenFallback`: the similarity
  * operators were spending their time in interpreted per-element closures
  * (same story as the shingle chain). This expression computes the SAME
  * sequential left fold (s += a(i)·b(i), ascending i — bit-identical
  * IEEE order; VectorParitySpec pins it against the HOF form) in one
  * compiled loop.
  *
  * NOTE: a 64-term UNROLLED expression tree was tried in round 1 and was
  * ~3× slower (codegen method-size limits); the fix is a loop in a static
  * helper, not a bigger tree. Inputs must be `array<double>` with no null
  * elements — [[VectorExpressions.dotFast]] casts at the Column level
  * (float→double widening is exact, matching the HOF's per-element cast).
  */
object VectorUtils {
  /** Precondition: equal-length arrays ([[DotExpr]] guards this and yields
    * NULL on mismatch). The min() bound is defensive only — with
    * UnsafeArrayData a read past either length is out-of-bounds memory,
    * so a future caller that skips the guard must not be able to trigger
    * one; it gets a truncated dot instead, never garbage. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even over non-null children: mismatched dimensions yield NULL
  // (the HOF twin's zip_with pads with null → aggregate folds to NULL), so
  // dimension-corrupt data surfaces as NULL, never a silently-partial dot
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null else VectorUtils.dot(av, bv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() == $b.numElements()) {
        ${ev.value} = graft.functions.VectorUtils.dot($a, $b);
      } else {
        ${ev.isNull} = true;
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_fast"
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Codegen'd sequential-fold dot product; accepts float or double
    * arrays (cast up front — exact widening, same values as the HOF's
    * per-element cast). */
  def dotFast(a: Column, b: Column): Column =
    column(DotExpr(
      expression(a.cast("array<double>")),
      expression(b.cast("array<double>"))))
}

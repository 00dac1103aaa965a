package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{coalesce, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen word-shingle expression.
  *
  * The declarative formulation (`transform(sequence(1, count), i =>
  * concat_ws(" ", element_at(w, i), …))` over `split(trim(text), " ")`)
  * is semantically right but every higher-order function in the chain is
  * `CodegenFallback` — the hottest loop of the dedup pipeline runs
  * interpreted, allocating per element. This expression produces the
  * identical array in one compiled pass (ShingleParitySpec pins
  * byte-equality against the HOF chain, including multi-space, newline,
  * short-doc, and empty inputs).
  *
  * Parity notes: Spark's `trim` strips 0x20 only (NOT Java's
  * `String.trim`) — `UTF8String.trim()` matches; tokenization splits on
  * whitespace RUNS (`TextOps.wsRunRegex`, the robust tokenizer that
  * survives real multi-space/tab/newline corpora) with limit -1, keeping
  * empty tokens exactly like Spark's `StringSplit`; a null input yields
  * an EMPTY array at the Column level (`coalesce`), matching the
  * `when(...).otherwise(array())` chain.
  */
object ShingleUtils {
  // precompiled whitespace-run pattern (graft.operators.TextOps.wsRunRegex
  // — duplicated as a literal to keep this class dependency-free for
  // codegen); Pattern.split(s, -1) == String.split(regex, -1)
  private val ws = java.util.regex.Pattern.compile("[ \\t\\n\\r\\f]+")

  def shingles(u: UTF8String, n: Int): ArrayData = {
    val s = u.trim().toString
    val parts = ws.split(s, -1)
    val count = parts.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val sb = new java.lang.StringBuilder(parts(i))
      var j = 1
      while (j < n) { sb.append(' ').append(parts(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtils.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtils.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "shingles_fast"
}

object ShingleExpressions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Codegen'd shingle array; null text → empty array (chain parity). */
  def shinglesFast(text: Column, n: Int): Column =
    coalesce(column(ShinglesExpr(expression(text), n)),
      typedlit(Array.empty[String]))
}

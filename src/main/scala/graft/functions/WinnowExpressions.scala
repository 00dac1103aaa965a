package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass winnowing selection (MOSS fingerprints).
  *
  * The declarative formulation — `transform(sequence(…), i ->
  * array_min(slice(grams, i, w)))` over a `transform`-built gram-hash
  * array — is the semantic reference ([[graft.operators.TextOps
  * .winnowingSelectionsHof]]), but it is an optimizer trap: any consumer
  * that references the selection exactly once (e.g. `explode` in the x55
  * match report) lets CollapseProject inline the WHOLE gram pipeline
  * into the consuming lambda/Generate, where Catalyst re-evaluates it
  * PER ELEMENT — O(L²) md5s per document (observed: a single sf0.1 doc
  * batch pinning a core for 10+ minutes). This expression computes the
  * identical array in one compiled pass per row — L digests, O(L·w)
  * window minima — and no plan rewrite can decompose it.
  *
  * Parity contract (WinnowParitySpec pins equality with the HOF form):
  * trim strips 0x20 only (`UTF8String.trim`), grams are SQL
  * `substr(t, i, k)` code-point semantics (end-clipped, empty text →
  * one empty gram), the hash is [[HashFunctions.polyHash52]] (exact
  * int64 polynomial fold over code points — one multiply-add per char
  * instead of an md5 digest per gram, which dominated the winnowing
  * queries' cost), windows are end-clipped like `slice`, and duplicates
  * collapse in first-occurrence order like `array_distinct`.
  */
object WinnowUtils {

  def select(u0: UTF8String, k: Int, w: Int): ArrayData = {
    val t = u0.trim()
    val cps = t.toString.codePoints().toArray
    val n = cps.length
    val nGrams = math.max(n - (k - 1), 1)
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // gram i = code points [i, min(i+k, n)) — end-clipped like substr
      grams(i) = HashFunctions.polyHash52Local(cps, i, math.min(i + k, n))
      i += 1
    }
    val nWins = math.max(nGrams - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](math.min(nWins, 64))
    var j = 0
    while (j < nWins) {
      val e = math.min(j + w, nGrams)
      var m = grams(j)
      var p = j + 1
      while (p < e) { if (grams(p) < m) m = grams(p); p += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Min [[HashFunctions.polyHash52Local]] over all end-clipped k-grams —
    * the x4 rolling-hash fingerprint in ONE compiled pass per row. The
    * HOF form (`array_min(transform(sequence(...), i ->
    * hash(t.substr(i, k))))`) paid an md5 digest per character AND
    * re-evaluated `trim(text)` per element inside the lambda (the
    * documented no-hoisting trap). Same gram semantics as [[select]]:
    * 0x20-only trim, code-point substr, empty/short text → one clipped
    * gram. */
  def minGramHash(u0: UTF8String, k: Int): Long = {
    val t = u0.trim()
    val cps = t.toString.codePoints().toArray
    val n = cps.length
    val nGrams = math.max(n - (k - 1), 1)
    var m = Long.MaxValue
    var i = 0
    while (i < nGrams) {
      val h = HashFunctions.polyHash52Local(cps, i, math.min(i + k, n))
      if (h < m) m = h
      i += 1
    }
    m
  }
}

case class WinnowSelectExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowUtils.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowUtils.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelectExpr =
    copy(child = newChild)
  override def prettyName: String = "winnow_select"
}

case class MinGramHashExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowUtils.minGramHash(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowUtils.minGramHash($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinGramHashExpr =
    copy(child = newChild)
  override def prettyName: String = "min_gram_hash"
}

object WinnowExpressions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** One-pass winnowing fingerprint selection; null text → null. */
  def winnowSelect(text: Column, k: Int, w: Int): Column =
    column(WinnowSelectExpr(expression(text), k, w))

  /** One-pass min k-gram polynomial hash; null text → null. */
  def minGramHash(text: Column, k: Int): Column =
    column(MinGramHashExpr(expression(text), k))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen whitespace-token COUNTER.
  *
  * `size(split(trim(text), "[ \t\n\r\f]+"))` — the ws_tokens shape used
  * by every token-accounting operator — materializes the full token
  * array (one UTF8String per token plus the array) only to take its
  * length, and regex-splits on the way. This expression computes the
  * identical count in one branch-light byte scan, zero allocation:
  * token count = (# maximal whitespace runs in the space-trimmed text)
  * + 1, which reproduces `split`'s `-1`-limit semantics exactly —
  * leading/trailing whitespace contributes an empty edge token, and the
  * empty string yields 1 (the singleton `[""]`).
  *
  * The whitespace set matches [[graft.operators.TextOps.wsRunRegex]]
  * (space, \t, \n, \r, \f — deliberately NOT \x0B, see the regex-parity
  * note there); all five are ASCII bytes, and multi-byte UTF-8 code
  * points always have the high bit set, so the byte scan is exact on any
  * unicode input. Trimming strips 0x20 only — Spark's `trim`, not
  * Java's. WsTokenParitySpec pins equality against the split form on
  * adversarial inputs. */
object TextUtils {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0d || b == 0x0c

  def wsTokenCount(u: UTF8String): Int = {
    val n = u.numBytes()
    var lo = 0
    while (lo < n && u.getByte(lo) == 0x20) lo += 1
    var hi = n
    while (hi > lo && u.getByte(hi - 1) == 0x20) hi -= 1
    var runs = 0
    var inRun = false
    var i = lo
    while (i < hi) {
      val ws = isWs(u.getByte(i))
      if (ws && !inRun) runs += 1
      inRun = ws
      i += 1
    }
    runs + 1
  }

  /** Array-producing twin of [[wsTokenCount]]: the token ARRAY equal to
    * `split(trim(text), "[ \t\n\r\f]+", -1)` — same 0x20-only trim, same
    * edge-empty-token semantics (leading/trailing runs contribute an
    * empty token; the empty string yields `[""]`) — with no regex
    * machinery and exactly one byte-array copy per row: tokens are
    * zero-copy slices over that private copy (`fromBytes` aliases, which
    * is safe because the copy is owned by this call, unlike the
    * row-buffer-backed input). */
  def wsTokens(u: UTF8String): ArrayData = {
    val bytes = u.getBytes
    val n = bytes.length
    var lo = 0
    while (lo < n && bytes(lo) == 0x20) lo += 1
    var hi = n
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    // first pass sizes the output exactly (same scan as wsTokenCount)
    var runs = 0
    var inRun = false
    var i = lo
    while (i < hi) {
      val ws = isWs(bytes(i))
      if (ws && !inRun) runs += 1
      inRun = ws
      i += 1
    }
    val out = new Array[AnyRef](runs + 1)
    var idx = 0
    var tokenStart = lo
    i = lo
    while (i < hi) {
      if (isWs(bytes(i))) {
        out(idx) = UTF8String.fromBytes(bytes, tokenStart, i - tokenStart)
        idx += 1
        while (i < hi && isWs(bytes(i))) i += 1
        tokenStart = i
      } else i += 1
    }
    out(idx) = UTF8String.fromBytes(bytes, tokenStart, hi - tokenStart)
    new GenericArrayData(out)
  }

  private val Space = UTF8String.fromString(" ")

  /** Adjacent-pair BIGRAM array over the [[wsTokens]] tokenization:
    * element i is `token(i) + " " + token(i+1)`; texts with fewer than
    * two tokens yield an empty array. Exists as a native expression
    * because the `zip_with(slice, slice, concat)` formulation carries
    * NamedLambdaVariables that defeat plan canonicalization — two
    * occurrences of the same bigram subtree then never compare equal, so
    * AQE cannot reuse the occurrence-matrix exchange and the corpus gets
    * tokenized twice (PlanShapeSpec pins the reuse). */
  def wsBigrams(u: UTF8String): ArrayData = {
    val toks = wsTokens(u)
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.concat(toks.getUTF8String(i), Space,
        toks.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All w-token window hashes of a token array in ONE compiled pass:
    * element i (0-based) equals
    * `xxhash64(toks[i], toks[i+1], …, toks[i+w-1])` — Spark's seed
    * chaining exactly (seed 42, each element's hash seeds the next;
    * null elements keep the running seed, like XxHash64.eval).
    * Fewer than w tokens → empty array (the caller's explode emits
    * nothing, same as the `when(size>=w, …)` HOF guard). Exists because
    * a `transform(sequence(…), i -> xxhash64(element_at…))` lambda is
    * evaluated INTERPRETED per window — boxing + per-element
    * element_at — on the hottest kernel of the exact-substring family
    * (WindowHashParitySpec pins equality with the HOF form). */
  def windowHashes(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val m = if (n >= w) n - w + 1 else 0
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = i
      val e = i + w
      while (j < e) {
        val s = toks(j)
        if (s != null)
          h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native one-pass w-token window hash array — see
  * [[TextUtils.windowHashes]]. */
case class WindowHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w > 0, s"w=$w")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextUtils.windowHashes(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextUtils.windowHashes($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "window_hashes"
}

case class WsTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextUtils.wsTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextUtils.wsTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCountExpr =
    copy(child = newChild)
  override def prettyName: String = "ws_token_count"
}

/** Native codegen whitespace TOKENIZER: `split(trim(text), ws-run-regex)`
  * allocates a regex matcher and per-token copies on every row of every
  * shingle/dedup/vocab query; this walks the bytes once. Parity with the
  * split form is pinned by WsTokenParitySpec on adversarial inputs and
  * the whole fixture corpus. */
case class WsTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextUtils.wsTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextUtils.wsTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokensExpr =
    copy(child = newChild)
  override def prettyName: String = "ws_tokens"
}

/** Native codegen whitespace BIGRAM array — see [[TextUtils.wsBigrams]]
  * for why this exists (lambda-free plan canonicalization). */
case class WsBigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextUtils.wsBigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextUtils.wsBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): WsBigramsExpr =
    copy(child = newChild)
  override def prettyName: String = "ws_bigrams"
}

object TextExpressions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Codegen'd token count == `size(wordsRe(text))`; null text → null. */
  def wsTokenCountFast(text: Column): Column =
    column(WsTokenCountExpr(expression(text)))

  /** Codegen'd token array == `split(trim(text), wsRunRegex)`;
    * null text → null. */
  def wsTokensFast(text: Column): Column =
    column(WsTokensExpr(expression(text)))

  /** Codegen'd adjacent-pair bigram array over the wsTokens split;
    * lambda-free so duplicate plan subtrees stay exchange-reusable. */
  def wsBigramsFast(text: Column): Column =
    column(WsBigramsExpr(expression(text)))

  /** Codegen'd w-token window hash array (0-based; chained xxhash64 per
    * window, seed 42); < w tokens → empty array; null array → null. */
  def windowHashes(toks: Column, w: Int): Column =
    column(WindowHashesExpr(expression(toks), w))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Aho-Corasick multi-pattern tagger (Aho & Corasick 1975,
  * "Efficient string matching: an aid to bibliographic search", CACM
  * 18(6)).
  *
  * The dictionary-audit primitive a curation pipeline runs per corpus:
  * count every occurrence of every term of a fixed lexicon (blocklist,
  * PII keyword list, taxonomy) in one pass per document. The
  * alternative formulations all break at either dictionary or corpus
  * scale: one `regexp_count`/`replace` pipeline PER TERM is a |D|-deep
  * expression tree re-scanning the text |D| times (the chained-replace
  * problem, [[BpeExpressions]]); a token-equi-join only sees
  * whitespace-token boundaries and misses multi-word or sub-token
  * terms. The automaton walks the text bytes ONCE — O(bytes + matches)
  * whatever the dictionary size — and the dictionary rides the
  * expression instance exactly like [[BpeRanks]] (serialized to
  * executors once per plan, goto/fail tables rebuilt lazily per JVM).
  *
  * Match semantics (the oracle-replayable contract): a term counts
  * once per STARTING POSITION, overlapping occurrences included — term
  * "a a" occurs TWICE in "a a a" — which is exactly `count(i :
  * substr(text, i, len(t)) = t)`, the form the DuckDB twin evaluates
  * positionally. Matching is byte-level over UTF-8, which is exact for
  * character semantics too: UTF-8 is self-synchronizing (continuation
  * bytes carry the high bits `10`, lead bytes never do), so a byte
  * match of a valid pattern inside valid text is always
  * codepoint-aligned — byte counts equal DuckDB's character-positional
  * counts on any unicode input (AcParitySpec pins multi-byte cases).
  *
  * The returned shape is the DENSE per-term count vector (length |D|),
  * not one element per occurrence: downstream explodes are then
  * bounded by |D| per document — a hot single-byte term inflates a
  * count, never the exchanged row count. */
object AcUtils {

  /** Byte-level full-DFA automaton: `next` is the completed goto
    * (fail links folded in — one array read per text byte), `out(s)`
    * the term ids whose occurrence ENDS at state `s` (own terms plus
    * the fail chain's, pre-aggregated at build). */
  final class AcAutomaton(val next: Array[Array[Int]],
                          val out: Array[Array[Int]], val nTerms: Int)
      extends Serializable

  def build(terms: IndexedSeq[String]): AcAutomaton = {
    require(terms.nonEmpty, "empty dictionary")
    require(terms.distinct.size == terms.size, "duplicate dictionary terms")
    val next = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val out = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    terms.zipWithIndex.foreach { case (t, id) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      require(bytes.nonEmpty, "empty dictionary term")
      var s = 0
      bytes.foreach { b =>
        val c = b & 0xFF
        if (next(s)(c) == -1) {
          next += Array.fill(256)(-1); out += Nil
          next(s)(c) = next.size - 1
        }
        s = next(s)(c)
      }
      out(s) = id :: out(s)
    }
    // BFS: fail links, goto completion, output aggregation. A fail
    // state is strictly shallower than its owner, so it is already
    // aggregated when the owner dequeues.
    val fail = Array.fill(next.size)(0)
    val queue = scala.collection.mutable.Queue.empty[Int]
    (0 until 256).foreach { c =>
      if (next(0)(c) == -1) next(0)(c) = 0
      else { fail(next(0)(c)) = 0; queue += next(0)(c) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ++ out(fail(s))
      (0 until 256).foreach { c =>
        val t = next(s)(c)
        if (t == -1) next(s)(c) = next(fail(s))(c)
        else { fail(t) = next(fail(s))(c); queue += t }
      }
    }
    new AcAutomaton(next.toArray, out.map(_.toArray).toArray, terms.size)
  }

  /** One automaton pass: the first `cap` hit POSITIONS per term,
    * encoded `term_id · 2^32 + start` (start = 1-based CHARACTER
    * position — the scan counts codepoints beside bytes, so positions
    * match a character-indexed engine's `substr` on any unicode input;
    * both components decode with div/mod 2^32). Per-term caps keep the
    * output bounded at |D|·cap whatever the match volume — the
    * localization read (WHERE to redact) that [[termCounts]]'s tallies
    * deliberately drop. Within a term, positions arrive in ascending
    * start order (fixed pattern length ⇒ end order = start order). */
  def hitPositions(u: UTF8String, dict: AcDict, cap: Int): ArrayData = {
    val a = dict.auto
    val taken = new Array[Int](a.nTerms)
    val buf = new java.util.ArrayList[java.lang.Long]
    var s = 0
    var charPos = 0L
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      val b = u.getByte(i)
      if ((b & 0xC0) != 0x80) charPos += 1L // leading byte: one codepoint
      s = a.next(s)(b & 0xFF)
      val os = a.out(s)
      var j = 0
      while (j < os.length) {
        val t = os(j)
        if (taken(t) < cap) {
          taken(t) += 1
          val start = charPos - dict.termChars(t) + 1L
          buf.add(java.lang.Long.valueOf((t.toLong << 32) | start))
        }
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](buf.size)
    var k = 0
    while (k < out.length) { out(k) = buf.get(k).longValue(); k += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** One automaton pass: dense per-term occurrence counts (length =
    * dictionary size, element i = occurrences of term i). */
  def termCounts(u: UTF8String, dict: AcDict): ArrayData = {
    val a = dict.auto
    val counts = new Array[Long](a.nTerms)
    var s = 0
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      s = a.next(s)(u.getByte(i) & 0xFF)
      val os = a.out(s)
      var j = 0
      while (j < os.length) { counts(os(j)) += 1L; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}

/** The dictionary payload an expression instance carries — terms in id
  * order; the automaton rebuilds lazily per JVM (the [[BpeRanks]]
  * discipline). */
final case class AcDict(terms: IndexedSeq[String]) {
  @transient lazy val auto: AcUtils.AcAutomaton = AcUtils.build(terms)
  /** Term lengths in CODEPOINTS (not bytes) — hit-position decoding. */
  @transient lazy val termChars: Array[Long] =
    terms.map(t => t.codePointCount(0, t.length).toLong).toArray
}

/** text → dense per-term occurrence counts under the dictionary; null
  * text → null. */
case class AcTermCountsExpr(child: Expression, dict: AcDict)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    AcUtils.termCounts(input.asInstanceOf[UTF8String], dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acDict", dict, classOf[AcDict].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.AcUtils.termCounts($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcTermCountsExpr =
    copy(child = newChild)
  override def prettyName: String = "ac_term_counts"
}

/** text → encoded first-`cap`-per-term hit positions; null text →
  * null. See [[AcUtils.hitPositions]] for the encoding. */
case class AcHitPositionsExpr(child: Expression, dict: AcDict, cap: Int)
    extends UnaryExpression {
  require(cap >= 1 && cap <= 65536, s"cap=$cap")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    AcUtils.hitPositions(input.asInstanceOf[UTF8String], dict, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acDict", dict, classOf[AcDict].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AcUtils.hitPositions($c, $ref, $cap)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcHitPositionsExpr =
    copy(child = newChild)
  override def prettyName: String = "ac_hit_positions"
}

object AcExpressions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Codegen'd dense dictionary-occurrence counts; null text → null. */
  def acTermCounts(text: Column, dict: AcDict): Column =
    column(AcTermCountsExpr(expression(text), dict))

  /** Codegen'd capped hit positions (encoded longs); null text → null. */
  def acHitPositions(text: Column, dict: AcDict, cap: Int): Column =
    column(AcHitPositionsExpr(expression(text), dict, cap))
}

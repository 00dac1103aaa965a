package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE segmentation for PRODUCTION-SIZED merge tables.
  *
  * The chained-`replace` form ([[graft.operators.BpeOps.segmented]]) is
  * the semantic reference and stays the DuckDB-twin representation, but
  * it materializes one `replace` NODE per merge: a 32k-merge production
  * vocabulary would be a 32k-deep expression tree — unanalyzable,
  * uncompilable, and O(R·L) per word regardless of which merges can
  * apply. This expression applies the same table in one compiled call:
  * a rank map lookup per adjacent pair, a min-heap over the ranks
  * actually PRESENT in the word, O(L · applied merges + L log L).
  *
  * Bit-parity contract with the chained form (BpeParitySpec pins it on
  * trained models; the x112/x114 oracle hashes re-pin it at both SFs,
  * since the DuckDB twin replays literal replaces):
  *   - merges apply in rank order, each exhaustively ONCE — the heap
  *     pops ranks in increasing order and a processed-set blocks
  *     reprocessing;
  *   - within a rank, occurrences merge left-to-right, non-overlapping
  *     (`replace` semantics);
  *   - an adjacency CREATED by a merge is pushed only when its rank is
  *     GREATER than the rank being applied: a chained pipeline has
  *     already passed the lower ranks, so a late lower-rank adjacency
  *     must stay unmerged (reachable when two different merges produce
  *     the same symbol string);
  *   - initial symbols are code points (the `regexp_replace(word,
  *     "(.)", SEP$1SEP)` segmentation — Java `.` matches a full code
  *     point), output is the same wrapped-symbol string (every symbol
  *     carries both separators).
  */
object BpeUtils {

  final val SEP = '\u001F'
  private final val KEY_SEP = '\u0000'

  /** Merge-rank lookups for a pair of symbols. */
  def key(l: String, r: String): String = l + KEY_SEP + r

  def segment(u: UTF8String, ranks: BpeRanks): UTF8String = {
    val cps = u.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    var syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = new String(Character.toChars(cps(i))); i += 1 }
    var len = n
    val rankOf = ranks.rankOf
    val heap = new java.util.PriorityQueue[Integer]
    val done = new java.util.HashSet[Integer]
    i = 0
    while (i < len - 1) {
      val rk = rankOf.get(key(syms(i), syms(i + 1)))
      if (rk != null) heap.add(rk)
      i += 1
    }
    while (!heap.isEmpty) {
      val rk = heap.poll()
      if (done.add(rk)) {
        val l = ranks.pairs(rk.intValue())._1
        val r = ranks.pairs(rk.intValue())._2
        val lr = l + r
        val out = new Array[String](len)
        var o = 0
        var p = 0
        var anyMerge = false
        while (p < len) {
          if (p < len - 1 && syms(p) == l && syms(p + 1) == r) {
            out(o) = lr
            // new adjacencies around the fused symbol — future ranks only
            if (o > 0) {
              val nrk = rankOf.get(key(out(o - 1), lr))
              if (nrk != null && nrk.intValue() > rk.intValue() &&
                !done.contains(nrk)) heap.add(nrk)
            }
            anyMerge = true
            p += 2
          } else {
            out(o) = syms(p)
            p += 1
          }
          // right-side adjacency of a fused symbol placed at o-1
          if (o > 0 && (out(o - 1) eq lr) && (out(o) ne lr)) {
            val nrk = rankOf.get(key(lr, out(o)))
            if (nrk != null && nrk.intValue() > rk.intValue() &&
              !done.contains(nrk)) heap.add(nrk)
          }
          o += 1
        }
        if (anyMerge) { syms = out; len = o }
      }
    }
    // wrapped output: every symbol owns BOTH its separators (the
    // representation BpeOps trains and the DuckDB twin replays)
    val sb = new java.lang.StringBuilder(u.numBytes() + 2 * len)
    i = 0
    while (i < len) { sb.append(SEP).append(syms(i)).append(SEP); i += 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** A trained merge table in rank order — the broadcast-free model
  * payload an expression instance carries (kryo/java-serialized to
  * executors once per plan; the rank map rebuilds lazily per JVM). */
final case class BpeRanks(pairs: IndexedSeq[(String, String)]) {
  @transient lazy val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.size * 2)
    var i = 0
    while (i < pairs.size) {
      // putIfAbsent: a duplicate pair (impossible in a sound trained
      // table) would only ever apply at its FIRST rank in the chained
      // form — the later replace finds nothing
      m.putIfAbsent(BpeUtils.key(pairs(i)._1, pairs(i)._2), Integer.valueOf(i))
      i += 1
    }
    m
  }
}

/** word (raw, not pre-segmented) → final segmentation under the merge
  * table, in the WRAPPED-symbol representation: equals
  * `segmented(model, regexp_replace(word, "(.)", SEP$1SEP))` for every
  * input (BpeParitySpec pins the equivalence against the chained
  * Column form). */
case class BpeSegmentExpr(child: Expression, ranks: BpeRanks)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BpeUtils.segment(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, classOf[BpeRanks].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUtils.segment($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_segment"
}

object BpeExpressions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Native BPE segmentation of a raw word column; null word → null. */
  def bpeSegment(word: Column, ranks: BpeRanks): Column =
    column(BpeSegmentExpr(expression(word), ranks))
}

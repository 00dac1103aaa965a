package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic, engine-portable hashing helpers.
  *
  * The dedup/LSH operators need hash functions that produce the SAME value
  * in Spark and in the DuckDB correctness oracle. Spark's `xxhash64`/`hash`
  * and DuckDB's `hash` are different algorithms, so everything portable
  * here is built on MD5 (identical hex output in both engines).
  *
  * At 100 TB scale MD5-based hashing is ~3x slower than xxhash64; the
  * operators accept a pluggable hash so production runs can switch to
  * `xxhash64` while correctness runs stay oracle-portable.
  */
object HashFunctions {

  /** 60-bit non-negative hash from the first 15 hex chars of md5.
    * Portable: DuckDB twin is
    * `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member i (for minhash). */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(lit(s"$seed|"), c.cast("string")))

  /** Fast non-portable 64-bit hash for production paths (not oracle-checked). */
  def fastHash(cols: Column*): Column = xxhash64(cols: _*)

  // ---- polynomial code-point hash (the cheap per-gram hash) ---------------
  // h = fold over code points of (h·B + cp) mod P, then two split-mix
  // rounds. P·B + 2^21 < 2^63 and every mix intermediate stays < 2^53,
  // so BOTH engines evaluate it in plain exact BIGINT arithmetic — no
  // md5 digest per gram (the digest dominated the winnowing queries'
  // cost). The mix rounds matter: short ASCII grams never wrap P, so the
  // raw fold is ORDER-PRESERVING — winnowing's window-min would then
  // systematically select low-codepoint (space-leading) grams, which
  // concentrate on boilerplate and die in the max-df guard (observed:
  // x55 match count collapsed 36× before the finalizer was added).
  // ~51-bit output; empty string hashes to 0 on both sides.

  val polyB: Long = 1031L
  val polyP: Long = 8946044652619363L // largest prime with polyP·polyB + 2^21 < 2^63
  private val mixM = 1L << 26
  private val mixK1 = 33554467L // primes ≈ 2^25: (M−1)·K + P/M < 2^53
  private val mixK2 = 33554393L

  /** Plain-Scala twin for native expressions (one fold per gram). */
  def polyHash52Local(cps: Array[Int], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = (h * polyB + cps(i)) % polyP; i += 1 }
    h = (h & (mixM - 1)) * mixK1 + (h >>> 26)
    (h & (mixM - 1)) * mixK2 + (h >>> 26)
  }

  /** Declarative Column form (HOF fold; parity/oracle reference, not the
    * hot path). `ascii` yields the code point of a 1-char substring —
    * WinnowParitySpec pins equality with the native fold on multi-byte
    * input. Spark's `sequence(1, 0)` DESCENDS, hence the empty guard. */
  def polyHash52(c: Column): Column = {
    def mix(h: Column, k: Long): Column = (h % mixM) * k + shiftright(h, 26)
    when(length(c) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1))).cast("long")),
        lit(0L), (h, cp) => (h * lit(polyB) + cp) % lit(polyP),
        h => mix(mix(h, mixK1), mixK2)))
  }

  /** One compiled fold per STRING for [[polyHash52]] — same code-point
    * semantics as the HOF form (PolyHashParitySpec pins equality incl.
    * multi-byte and empty input; empty folds to 0 through the mix with
    * no special case). The HOF form evaluates a lambda per character
    * with a boxed sequence/transform allocation per row — measured 6×
    * the whole feature-matrix cost on the DSIR family, which hashes
    * every unigram+bigram of the corpus. */
  def polyHash52Utf8(u: UTF8String): Long = {
    val s = u.toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * polyB + cp) % polyP
      i += Character.charCount(cp)
    }
    h = (h & (mixM - 1)) * mixK1 + (h >>> 26)
    (h & (mixM - 1)) * mixK2 + (h >>> 26)
  }

  /** Native-expression Column form of [[polyHash52]] — use THIS on hot
    * paths; the HOF form is the parity/oracle reference. */
  def polyHash52Fast(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
    column(PolyHash52Expr(expression(c)))
  }

  /** DuckDB SQL snippet twin of [[polyHash52]] — keep in sync.
    * (`generate_series(1, 0)` is EMPTY in DuckDB, so the empty string
    * folds over the prepended seed alone → 0, matching the guard.)
    * Lambda variables are prefixed `ph_` — callers embed this snippet
    * inside their own lambdas, and an unprefixed `i` would capture the
    * caller's loop variable. The single-element list_transforms bind the
    * fold result once per mix round instead of inlining it 4×. */
  def polyHash52Sql(expr: String): String = {
    val fold = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, length($expr)), " +
      s"ph_j -> CAST(unicode(substr($expr, ph_j, 1)) AS BIGINT))), " +
      s"(ph_h, ph_c) -> (ph_h * $polyB + ph_c) % $polyP)"
    s"list_transform([$fold], ph_x -> " +
      s"list_transform([(ph_x % $mixM) * $mixK1 + (ph_x // $mixM)], ph_y -> " +
      s"(ph_y % $mixM) * $mixK2 + (ph_y // $mixM))[1])[1]"
  }

  /** DuckDB SQL snippet twin of [[hash60]] — keep in sync. */
  def hash60Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5(CAST($expr AS VARCHAR)), 1, 15)) AS BIGINT)"

  def hash60Sql(expr: String, seed: Int): String =
    hash60Sql(s"concat('$seed|', CAST($expr AS VARCHAR))")
}

/** Native one-pass [[HashFunctions.polyHash52]] over a string — one
  * compiled code-point fold per row (the WinnowExpressions pattern),
  * replacing a per-character lambda evaluation. Null → null
  * (nullIntolerant), matching the HOF form. */
case class PolyHash52Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashFunctions.polyHash52Utf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashFunctions.polyHash52Utf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash52Expr =
    copy(child = newChild)
  override def prettyName: String = "poly_hash52"
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded bottom-k state: the k smallest `(key, id)` pairs seen, total
  * order `(key, id)` so key ties are deterministic. A binary max-heap on
  * arrays — O(log k) insert, O(k) memory, merge = replay. */
final class BottomKBuffer(val k: Int) {
  // heap of pairs, max at root, lexicographic (key, id) order
  private var keys = new Array[Long](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  var size = 0

  private def less(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
    k1 < k2 || (k1 == k2 && i1 < i2)

  private def grow(): Unit = if (size == keys.length && size < k) {
    val n = math.min(k, keys.length * 2)
    keys = java.util.Arrays.copyOf(keys, n)
    ids = java.util.Arrays.copyOf(ids, n)
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && less(keys((i - 1) / 2), ids((i - 1) / 2), keys(i), ids(i))) {
      val p = (i - 1) / 2
      swap(i, p); i = p
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && less(keys(m), ids(m), keys(l), ids(l))) m = l
      if (r < size && less(keys(m), ids(m), keys(r), ids(r))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val tk = keys(a); keys(a) = keys(b); keys(b) = tk
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def add(key: Long, id: Long): Unit =
    if (size < k) {
      grow()
      keys(size) = key; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && less(key, id, keys(0), ids(0))) {
      keys(0) = key; ids(0) = id
      siftDown()
    }

  def foreachPair(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < size) { f(keys(i), ids(i)); i += 1 }
  }

  /** Contents sorted ascending by (key, id). */
  def sortedPairs: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](size)
    var i = 0
    while (i < size) { out(i) = (keys(i), ids(i)); i += 1 }
    java.util.Arrays.sort(out, (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    out
  }
}

/** `bottom_k_by_hash(key, id, k)` — the k smallest `(key, id)` pairs per
  * group as `array<struct<h, id>>`, ascending.
  *
  * The SCALE point: fixed-k per-stratum sampling via a window
  * (`row_number() OVER (PARTITION BY … ORDER BY hash) <= k`) sorts and
  * shuffles the ENTIRE stratum; this aggregate keeps O(k) state per
  * group per partition, partially aggregates map-side (the shuffle
  * carries ≤ k pairs per group per map task), and merges heaps — the
  * same result with no per-stratum sort at any corpus size. Plans as an
  * ObjectHashAggregate with a partial stage (PlanShapeSpec pins this).
  *
  * Deterministic: the total order is `(key, id)`, so equal hash keys
  * break by id — bit-identical to the window formulation, which is the
  * DuckDB oracle twin (x53). */
case class BottomKByHash(
    key: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = key
  override def right: Expression = id

  // non-long children (e.g. an int id passed straight to the public
  // Column helper) must fail at ANALYSIS, not with a runtime
  // ClassCastException inside update(). (AbstractDataType is private[sql],
  // so this is checkInputDataTypes rather than the ExpectsInputTypes mixin.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == LongType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bottom_k_by_hash requires (BIGINT, BIGINT) inputs, " +
        s"got (${key.dataType.sql}, ${id.dataType.sql})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(b: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      b.add(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    b
  }

  override def merge(b: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    other.foreachPair((h, i) => b.add(h, i))
    b
  }

  override def eval(b: BottomKBuffer): Any = {
    val rows: Array[Any] = b.sortedPairs.map { case (h, i) =>
      InternalRow(h, i): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    b.foreachPair((h, i) => { bb.putLong(h); bb.putLong(i) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new BottomKBuffer(k)
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKByHash =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKByHash =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKByHash =
    copy(key = newLeft, id = newRight)
  override def prettyName: String = "bottom_k_by_hash"
}

object SampleAggregates {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Bottom-k `(key, id)` pairs per group, ascending `array<struct<h,id>>`. */
  def bottomKByHash(key: Column, id: Column, k: Int): Column =
    column(BottomKByHash(expression(key), expression(id), k)
      .toAggregateExpression(isDistinct = false))
}

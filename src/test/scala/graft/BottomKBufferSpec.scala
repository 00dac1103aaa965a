package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BottomKBuffer

/** Randomized (seeded) property tests for the hand-written bounded heap
  * behind the x53 aggregate: any sequence of adds, and any partition
  * into merged sub-buffers, must equal sort-take on the distinct pair
  * set. 500 trials each over adversarially small key/id domains (heavy
  * ties) and k spanning under/over the input size. */
class BottomKBufferSpec extends AnyFunSuite {

  private def reference(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    pairs.sortBy(identity).take(k)

  private def trial(rnd: scala.util.Random): (List[(Long, Long)], Int) = {
    val n = rnd.nextInt(60)
    // small domains force key ties (id tiebreak) and duplicate pairs
    val pairs = List.fill(n)((rnd.nextInt(40) - 20L, rnd.nextInt(25).toLong))
      .distinct
    (pairs, 1 + rnd.nextInt(12))
  }

  test("add-only equals sort-take for any input and k (500 seeded trials)") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 500) {
      val (pairs, k) = trial(rnd)
      val b = new BottomKBuffer(k)
      pairs.foreach { case (h, i) => b.add(h, i) }
      assert(b.sortedPairs.toSeq === reference(pairs, k), s"k=$k pairs=$pairs")
    }
  }

  test("arbitrary partition + merge equals sort-take (map-side combine soundness)") {
    val rnd = new scala.util.Random(5678)
    for (_ <- 1 to 500) {
      val (pairs, k) = trial(rnd)
      val parts = 1 + rnd.nextInt(5)
      val chunkSize = math.max(1, (pairs.size + parts - 1) / parts)
      val acc = new BottomKBuffer(k)
      pairs.grouped(chunkSize).foreach { chunk =>
        val b = new BottomKBuffer(k)
        chunk.foreach { case (h, i) => b.add(h, i) }
        b.foreachPair((h, i) => acc.add(h, i))
      }
      assert(acc.sortedPairs.toSeq === reference(pairs, k), s"k=$k pairs=$pairs")
    }
  }

  test("serialization round-trip preserves contents") {
    val agg = graft.functions.BottomKByHash(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 5)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val (pairs, _) = trial(rnd)
      val b = new BottomKBuffer(5)
      pairs.foreach { case (h, i) => b.add(h, i) }
      val back = agg.deserialize(agg.serialize(b))
      assert(back.sortedPairs.toSeq === b.sortedPairs.toSeq)
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Connected-component duplicate clustering: min-label propagation must
  * cover chain components (the worst case for per-round propagation) and
  * leave singletons self-labeled. */
class DedupClusterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("chain + pair + singleton resolve to min-id clusters") {
    val s = spark
    import s.implicits._
    val docs = (1L to 7L).toDF("doc_id")
    // chain 1-2-3-4 (diameter 3), pair 5-6, singleton 7; pair order mixed
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (6L, 5L)).toDF("doc_a", "doc_b")
    val out = DedupOps.dupClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("empty pair set: every doc is its own cluster") {
    val s = spark
    import s.implicits._
    val docs = (1L to 3L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = DedupOps.dupClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}

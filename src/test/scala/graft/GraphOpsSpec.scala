package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Integer PageRank (x119): engine output must equal a driver-side
  * reference running the same floor arithmetic, hubs must rank first on
  * a known topology, and total mass must be conserved up to the floor
  * losses (≤ deg·its per node). */
class GraphOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val unit = 1000000000000L

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Driver-side reference: identical integer iteration. */
  private def referenceRanks(pairs: Seq[(Long, Long)],
                             iterations: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val base = 15L * unit / 100L
    var r: Map[Long, Long] = deg.map { case (n, _) => n -> unit }
    for (_ <- 1 to iterations) {
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = inc.map { case (n, s) => n -> (base + 85L * s / 100L) }
    }
    r
  }

  private def pairsDf(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    pairs.toDF("u_a", "u_b")
  }

  test("ranks equal the driver-side integer reference exactly") {
    // a hub (0) with 5 spokes, a triangle (10,11,12), a 4-chain
    val pairs = Seq[(Long, Long)](
      (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
      (10, 11), (11, 12), (10, 12),
      (20, 21), (21, 22), (22, 23))
    val got = GraphOps.pageRank(pairsDf(pairs), iterations = 6, topK = 100)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ref = referenceRanks(pairs, 6)
    assert(got.keySet === ref.keySet)
    got.foreach { case (id, (_, score)) =>
      assert(score === ref(id), s"node $id: engine $score != reference ${ref(id)}")
    }
  }

  test("the star hub out-ranks every spoke and every other component") {
    val pairs = Seq[(Long, Long)](
      (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (10, 11))
    val top = GraphOps.pageRank(pairsDf(pairs), iterations = 6, topK = 1)
      .collect().head
    assert(top.getLong(0) === 0L, "hub must rank first")
    assert(top.getLong(1) === 5L)
  }

  test("total mass is conserved up to floor losses") {
    val pairs = Seq[(Long, Long)](
      (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0))
    val rows = GraphOps.pageRank(pairsDf(pairs), iterations = 6, topK = 100)
      .collect()
    val total = rows.map(_.getLong(2)).sum
    val n = rows.length
    // each round loses < deg per node to `div deg` and < 100 to `div 100`
    val maxLoss = 6L * n * (2 * pairs.length + 100)
    assert(total <= n * unit)
    assert(total >= n * unit - maxLoss,
      s"mass $total fell below ${n * unit} - $maxLoss")
  }
}

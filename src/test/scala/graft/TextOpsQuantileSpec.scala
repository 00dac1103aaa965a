package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.TextOps

/** x32 length quantiles: the exact rank-based form (the oracle) and the
  * sketch the 100 TB path swaps in (`approx_percentile`, t-digest) must
  * agree on the fixture corpus — the evidence that the swap preserves
  * the profile a curation run acts on. */
class TextOpsQuantileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("rank quantiles are ordered and bounded by the per-lang extremes") {
    val docs = Tables.documents(spark, sfDir)
    val rows = TextOps.lengthQuantiles(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p10, p50, p90, p99) = Seq(2, 3, 4, 5).map(r.getLong)
      assert(p10 <= p50 && p50 <= p90 && p90 <= p99)
    }
  }

  test("approx_percentile (the 100 TB swap) tracks the exact ranks") {
    val docs = Tables.documents(spark, sfDir)
    val exact = TextOps.lengthQuantiles(docs).collect()
      .map(r => r.getString(0) -> Seq(2, 3, 4, 5).map(r.getLong)).toMap
    val ps = TextOps.quantilePoints.map(_._2)
    val approx = docs
      .select(col("lang"), size(TextOps.wordsRe(col("text"))).as("n"))
      .groupBy("lang")
      .agg(percentile_approx(col("n"),
        array(ps.map(lit(_)): _*), lit(10000)).as("q"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1).map(_.toLong)).toMap
    assert(approx.keySet === exact.keySet)
    for (lang <- exact.keys; i <- ps.indices) {
      val (e, a) = (exact(lang)(i), approx(lang)(i))
      // t-digest at accuracy 10k is near-exact at this corpus size; allow
      // one rank of slack for its different tie convention
      assert(math.abs(e - a) <= math.max(1L, e / 20),
        s"$lang p=${ps(i)}: exact=$e approx=$a")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Corpus-statistics operators: PMI collocations (x74) and friends —
  * closed-form fixtures pin the exact micro-nat scores; the real-corpus
  * tests pin ordering, count floors, and determinism. */
class CorpusStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("PMI: closed-form single-doc fixture matches hand arithmetic") {
    val s = spark
    import s.implicits._
    // tokens: new york new york -> T1=4, c1(new)=c1(york)=2
    // bigrams: (new york) x2, (york new) x1 -> T2=3
    // PMI(new york) = ln(c2*T1^2 / (T2*c1a*c1b)) = ln(2*16/(3*2*2)) = ln(8/3)
    val df = Seq(1L -> "new york new york").toDF("doc_id", "text")
    val rows = TextOps.pmiCollocations(df, minCount = 2, k = 10).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "new york")
    assert(r.getLong(1) == 2L) // cnt
    assert(r.getLong(4) ==
      math.floor(math.log(8.0 / 3.0) * 1e6 + 0.5).toLong)
  }

  test("PMI: associated pair outranks frequent-but-independent pair") {
    val s = spark
    import s.implicits._
    // "strong assoc": (aa bb) always adjacent; cc/dd frequent but paired
    // with everything -> low PMI
    val df = Seq(
      1L -> "aa bb cc dd aa bb dd cc",
      2L -> "cc aa bb dd cc dd",
      3L -> "dd cc aa bb cc dd"
    ).toDF("doc_id", "text")
    val rows = TextOps.pmiCollocations(df, minCount = 2, k = 20).collect()
    val byBigram = rows.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byBigram.contains("aa bb"))
    assert(byBigram("aa bb") > byBigram.getOrElse("cc dd", Long.MinValue))
    // sorted desc by pmi_micro, ties by bigram
    val pmis = rows.map(r => (r.getLong(4), r.getString(0)))
    assert(pmis.sortBy { case (p, b) => (-p, b) }.toSeq == pmis.toSeq)
  }

  test("PMI: count floor removes singletons; real corpus is non-degenerate") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextOps.pmiCollocations(docs, minCount = 5, k = 50).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_.getLong(1) >= 5L))
    // pmi_nats is exactly the snapped micro value / 1e6
    rows.foreach(r => assert(r.getDouble(5) == r.getLong(4).toDouble / 1e6))
  }
}

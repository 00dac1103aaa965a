package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Edge semantics of the round-4 text operators: redaction boundaries,
  * repetition-ratio extremes, and top-term scoring/tie-breaks. */
class TextOpsEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dedup family is whitespace-robust: runs of mixed whitespace tokenize like single spaces") {
    val s = spark
    import s.implicits._
    import graft.operators.DedupOps
    // same content, hostile whitespace — the dedup family must identify them
    val docs = Seq(
      (1L, "the quick brown fox jumps over"),
      (2L, "the  quick\tbrown fox\njumps  over"), // runs, tab, newline
      (3L, "entirely different content here now ok")).toDF("doc_id", "text")
    val keys = docs.select(col("doc_id"), DedupOps.normalizedKey().as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) === keys(2L), "normalized key must ignore whitespace runs")
    assert(keys(1L) !== keys(3L))
    val sh = docs.select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) === sh(2L), "shingles must ignore whitespace runs")
    val sims = DedupOps.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) === sims(2L), "simhash must ignore whitespace runs")
    val sigs = DedupOps.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sigs(1L) === sigs(2L), "minhash signature must ignore whitespace runs")
  }

  test("redact: emails and 7+-digit runs scrubbed; 6-digit runs and bare at-signs kept") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "mail a.b-c@ex.co and x@y.io now"),
      (2L, "short 123456 stays, 1234567 goes, 123456789012 goes"),
      (3L, "not-an-email @ by itself and a@b stays (no tld)"))
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id"), TextOps.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "mail <EMAIL> and <EMAIL> now")
    assert(out(2L) === "short 123456 stays, <NUM> goes, <NUM> goes")
    assert(out(3L) === "not-an-email @ by itself and a@b stays (no tld)")
    val counts = TextOps.redactionReport(rows).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(counts(1L) === ((2, 0)) && counts(2L) === ((0, 2)) && counts(3L) === ((0, 0)))
  }

  test("repetition ratios: all-same, all-distinct, and single-word extremes") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "a a a a"),   // words: 1 - 1/4; 2-grams "a a"×3: 1 - 1/3
      (2L, "w x y z"),   // all distinct → 0, 0
      (3L, "solo"))      // one word → 0 words dup; no 2-grams → 0
      .toDF("doc_id", "text")
    val out = TextOps.repetitionReport(rows).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 0.75 && math.abs(out(1L)._2 - (1.0 - 1.0 / 3)) < 1e-12)
    assert(out(2L) === ((0.0, 0.0)))
    assert(out(3L) === ((0.0, 0.0)))
  }

  test("topTerms: exclusive terms outrank shared ones; ties break alphabetically") {
    val s = spark
    import s.implicits._
    // 'shared' appears in both langs (df=4, per-lang tf=2 → 0.5);
    // 'aaa'/'bbb' are exclusive to xx (df=2, tf=2 → 1.0) and tie
    val rows = Seq(
      (1L, "xx", "aaa bbb shared"), (2L, "xx", "aaa bbb shared"),
      (3L, "yy", "ccc shared"), (4L, "yy", "ccc shared"))
      .toDF("doc_id", "lang", "text")
    val out = TextOps.topTerms(rows, k = 3).collect()
      .map(r => (r.getString(0), r.getInt(5)) -> r.getString(1)).toMap
    assert(out(("xx", 1)) === "aaa") // tie with bbb → alphabetical
    assert(out(("xx", 2)) === "bbb")
    assert(out(("xx", 3)) === "shared")
    assert(out(("yy", 1)) === "ccc")
  }
}

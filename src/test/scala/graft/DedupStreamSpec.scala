package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

final case class InDoc(doc_id: Long, text: String, ts: Timestamp)

/** Dedup-on-ingest: duplicate texts inside the watermark horizon are
  * suppressed across micro-batches; distinct texts all pass. */
class DedupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("within-horizon duplicates are suppressed across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[InDoc]
    val query = DedupStream.dedupOnIngest(in.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(
        InDoc(1L, "alpha text", ts("2024-01-01 10:00:00")),
        InDoc(2L, "beta text", ts("2024-01-01 10:01:00")),
        InDoc(3L, "alpha text", ts("2024-01-01 10:02:00"))) // dup in-batch
      query.processAllAvailable()
      in.addData(
        InDoc(4L, "alpha text", ts("2024-01-01 10:10:00")), // dup across batches
        InDoc(5L, "gamma text", ts("2024-01-01 10:11:00")))
      query.processAllAvailable()

      val got = spark.table("dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // one survivor per distinct text; doc 1 beat 3 and 4
      assert(got === Set(1L, 2L, 5L))
    } finally query.stop()
  }
}

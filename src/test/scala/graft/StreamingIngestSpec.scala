package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.StateStore
import graft.sources.FsScrape.ScrapeRecord
import graft.streaming.StreamingIngest

/** Structured-Streaming ingest (§2.9): staged drops → micro-batch →
  * idempotent merge; replay converges (exactly-once posture). */
class StreamingIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rec(kind: String, parent: String, name: String,
                  size: String = null): ScrapeRecord =
    ScrapeRecord(kind, parent, name,
      if (name.isEmpty) parent else s"$parent/$name",
      if (size == null) null else new java.math.BigDecimal(size),
      t1, t1, t1)

  test("staged drops stream into merged state; replayed batch is a no-op") {
    val s = spark
    import s.implicits._
    val stageDir = Files.createTempDirectory("graft_stage").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val state = new StateStore(spark, Files.createTempDirectory("graft_sstate").toString)

    val drop1 = Seq(
      rec("self", "/data", ""),
      rec("dir", "/data", "sub"),
      rec("file", "/data", "a.txt", "0.000010"),
      rec("file", "/data", "b.txt", "0.000020"))
    drop1.toDS().coalesce(1).write.mode("append").parquet(stageDir)

    val q = StreamingIngest.start(state, stageDir, ckpt,
      triggerMs = 200, asOfOverride = Some(t1))
    try {
      q.processAllAvailable()
      assert(state.read("directory").count() === 2) // /data, /data/sub
      assert(state.read("file").count() === 2)

      // second drop: one new file, one unchanged replay of a.txt
      Seq(rec("file", "/data", "a.txt", "0.000010"),
          rec("file", "/data", "c.txt", "0.000030"))
        .toDS().coalesce(1).write.mode("append").parquet(stageDir)
      q.processAllAvailable()

      val files = state.read("file")
      assert(files.count() === 3)
      // idempotent merge: replayed identical a.txt did not duplicate or
      // bump its audit column
      val a = files.filter(col("name") === "a.txt").collect()
      assert(a.length === 1)
      assert(a.head.getAs[Timestamp]("updated_on") === t1)
    } finally q.stop()
  }
}

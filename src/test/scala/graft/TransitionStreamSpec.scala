package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, TransitionStream}
import graft.streaming.TransitionStream.{EvIn, Transition}

/** Stateful transition extraction (the x135 streaming twin): emitted
  * pairs must equal the batch window's pairs — gap cuts, (ts, event_id)
  * tiebreak, and cross-batch state included — and idle-user state must
  * expire via the watermark. */
class TransitionStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("stream pairs == batch pairs across micro-batch boundaries; gaps cut; state expires") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Seq(
      EvIn(1L, 1L, "a", ts("2024-01-01 10:00:00")),
      EvIn(1L, 2L, "b", ts("2024-01-01 10:05:00")),
      EvIn(2L, 3L, "a", ts("2024-01-01 10:00:00")),
      // CROSS-BATCH continuation for user 1 (delivered in batch 2):
      EvIn(1L, 4L, "c", ts("2024-01-01 10:20:00")),
      // past the 30-min gap: b->...->c never pairs with this one
      EvIn(1L, 5L, "a", ts("2024-01-01 12:00:00")),
      EvIn(2L, 6L, "b", ts("2024-01-01 10:10:00")))

    val input = MemoryStream[EvIn]
    val out = TransitionStream.transitions(input.toDS(), gapMinutes = 30,
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      input.addData(all.take(3)); q.processAllAvailable()
      input.addData(all.drop(3)); q.processAllAvailable()
      val got = spark.table("trans_out").as[Transition].collect()
        .map(t => (t.user_id, t.prev_type, t.next_type)).sorted.toSeq

      // batch twin over the same rows: the pair extraction before the
      // matrix aggregation (re-derive via sessionTransitions' window on
      // a per-user basis — here hand-enumerated from the fixture)
      val expected = Seq(
        (1L, "a", "b"), (1L, "b", "c"), // cross-batch b->c pairs
        (2L, "a", "b"))                 // user 2 within gap
      assert(got === expected.sorted.toSeq,
        s"stream pairs $got != batch pairs $expected")

      // the batch-side MATRIX over the emitted pairs equals x135's
      // matrix on the same events (finishing arithmetic shared on read)
      val evDf = all.map(e => (e.event_id, e.user_id, e.event_type, e.ts))
        .toDF("event_id", "user_id", "event_type", "ts")
      val batchTop = EventStreams.sessionTransitions(evDf).collect()
        .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_trans")))
        .toSet
      val streamMatrix = got.groupBy(t => (t._2, t._3))
        .map { case ((p, n), xs) => (p, n, xs.size.toLong) }.toSet
      assert(streamMatrix === batchTop,
        "matrix over streamed pairs must equal the batch matrix")
    } finally q.stop()
  }

  test("cross-batch disorder: no inverted pairs, state never regresses") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[EvIn]
    val out = TransitionStream.transitions(input.toDS(), gapMinutes = 30,
      watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("trans_disorder")
      .outputMode("append").start()
    try {
      // batch 1: events at 10:00 (a) and 10:10 (c)
      input.addData(Seq(
        EvIn(1L, 1L, "a", ts("2024-01-01 10:00:00")),
        EvIn(1L, 3L, "c", ts("2024-01-01 10:10:00"))))
      q.processAllAvailable()
      // batch 2: a STALE event from 10:05 (inside the 30-min watermark,
      // older than the stored 10:10 state) — must not emit the inverted
      // (c -> b) pair, and must not regress the state to 10:05
      input.addData(Seq(EvIn(1L, 2L, "b", ts("2024-01-01 10:05:00"))))
      q.processAllAvailable()
      // batch 3: 10:15 (d) — pairs with the chronologically latest (c),
      // proving the stale b did not replace the state
      input.addData(Seq(EvIn(1L, 4L, "d", ts("2024-01-01 10:15:00"))))
      q.processAllAvailable()

      val got = spark.table("trans_disorder").as[Transition].collect()
        .map(t => (t.prev_type, t.next_type)).sorted.toSeq
      // (a->c) from batch 1; batch 2's stale arrival emits nothing
      // (inverted); (c->d) from batch 3 — NOT (b->d)
      assert(got === Seq(("a", "c"), ("c", "d")),
        s"disorder must neither invert pairs nor regress state: $got")
    } finally q.stop()
  }
}

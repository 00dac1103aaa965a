package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stateful-streaming twin of
  * `graft.operators.TemporalJoins.asOfJoin` (backward-inclusive): every
  * left row is matched to the latest right row at-or-before its event
  * time within the same key, and emits EXACTLY ONCE, only when the
  * event-time watermark proves no earlier right row can still arrive.
  *
  * Both sides arrive as ONE tagged stream (side 0 = right, 1 = left) so a
  * single watermark governs them — the same single-shuffle shape as the
  * batch operator: state is partitioned by key, and each row crosses the
  * wire once.
  *
  * Per-key state is a bounded buffer:
  *   - pending left rows — only those at-or-after the watermark (older
  *     ones have emitted);
  *   - right rows still reachable — everything after the watermark-or-
  *     oldest-pending horizon, plus the single newest right at-or-before
  *     it (the match any future left would take). Superseded rights are
  *     pruned every invocation, so state is one newest right per active
  *     key plus the rows inside the watermark lag — never O(stream). The
  *     per-key floor is inherent to as-of enrichment (the latest right
  *     must stay available for a future left), exactly like a
  *     stream-table join's table side; bound it with key TTL upstream if
  *     keys churn without bound.
  *
  * Timestamps are millisecond epoch (`Timestamp.getTime`); ties at the
  * same ms stay backward-inclusive, matching the batch operator.
  */
object AsOfStream {

  final case class AsOfIn(key: Long, ts: Timestamp, side: Int, id: Long)
  final case class AsOfOut(key: Long, l_id: Long, l_epoch_ms: Long,
                           r_id: Option[Long], gap_ms: Option[Long])
  final case class Buf(rights: List[(Long, Long)], lefts: List[(Long, Long)])

  def asOfEnrich(rows: Dataset[AsOfIn],
                 watermark: String = "1 hour"): Dataset[AsOfOut] = {
    implicit val stateEnc = Encoders.product[Buf]
    implicit val outEnc = Encoders.product[AsOfOut]
    rows
      .withWatermark("ts", watermark)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, batch: Iterator[AsOfIn], state: GroupState[Buf]) => {
          val st = state.getOption.getOrElse(Buf(Nil, Nil))
          var rights = st.rights
          var lefts = st.lefts
          batch.foreach { r =>
            val t = r.ts.getTime
            if (r.side == 0) rights = (t, r.id) :: rights
            else lefts = (t, r.id) :: lefts
          }
          val wm = state.getCurrentWatermarkMs()
          // a left at ts is final once wm > ts: any right row at-or-before
          // it would now be late and dropped by the watermark contract
          val (emit, keep) = lefts.partition(_._1 < wm)
          val sortedRights = rights.sortBy(identity)
          val out = emit.sortBy(identity).map { case (lt, lid) =>
            val m = sortedRights.takeWhile(_._1 <= lt).lastOption
            AsOfOut(key, lid, lt, m.map(_._2), m.map(lt - _._1))
          }
          // prune rights no pending or future left can match: future lefts
          // are >= wm, pending ones >= their own ts — below the horizon
          // only the newest right remains reachable
          val horizon = (wm :: keep.map(_._1)).min
          val (older, newer) = sortedRights.partition(_._1 <= horizon)
          val cut = older.lastOption.toList ::: newer
          if (cut.isEmpty && keep.isEmpty) {
            state.remove()
          } else {
            state.update(Buf(cut, keep))
            // wake this key when the watermark passes its oldest pending
            // left, even if no further rows arrive
            keep.map(_._1).minOption
              .foreach(t => state.setTimeoutTimestamp(t + 1))
          }
          out.iterator
        })
  }
}

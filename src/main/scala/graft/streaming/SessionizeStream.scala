package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True stateful-streaming sessionization via `flatMapGroupsWithState` —
  * the streaming twin of [[EventStreams.userSessions]] (same gap
  * semantics). Custom per-key state: the open session; a session closes
  * when a later event arrives past the gap OR the event-time watermark
  * passes lastTs+gap (timeout), so closed sessions emit exactly once in
  * Append mode.
  *
  * Scale: state is O(active users) — one small record per key — and lives
  * in the state store, partitioned by user_id; skewed users don't grow
  * state (only their session bounds update).
  */
object SessionizeStream {

  final case class EventIn(user_id: Long, ts: Timestamp)
  final case class OpenSession(startEpoch: Long, endEpoch: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start_epoch: Long,
                              session_end_epoch: Long, n_events: Long,
                              duration_sec: Long)

  def sessionize(events: Dataset[EventIn], gapMinutes: Int,
                 watermark: String = "1 hour"): Dataset[SessionOut] = {
    val gapSec = gapMinutes * 60L
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[EventIn], state: GroupState[OpenSession]) => {
          def out(s: OpenSession) = SessionOut(userId, s.startEpoch, s.endEpoch,
            s.n, s.endEpoch - s.startEpoch)

          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed lastTs+gap: the open session is final
            val closed = state.getOption.map(out).toSeq
            state.remove()
            closed.iterator
          } else {
            val closedSessions = Seq.newBuilder[SessionOut]
            var open = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val epoch = e.ts.getTime / 1000
              open match {
                case Some(s) if epoch - s.endEpoch <= gapSec =>
                  open = Some(OpenSession(s.startEpoch, math.max(s.endEpoch, epoch), s.n + 1))
                case Some(s) => // gap exceeded: close, start fresh
                  closedSessions += out(s)
                  open = Some(OpenSession(epoch, epoch, 1))
                case None =>
                  open = Some(OpenSession(epoch, epoch, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when the watermark passes the gap after the last event
              state.setTimeoutTimestamp((s.endEpoch + gapSec) * 1000 + 1)
            }
            closedSessions.result().iterator
          }
        })
  }
}

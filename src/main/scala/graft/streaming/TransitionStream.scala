package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful transition extraction — the streaming half of the x135
  * contract ([[EventStreams.sessionTransitions]]): per-user state holds
  * only the LAST event (type + epoch + a tiebreak id); each arrival past
  * it emits the (prev, next) pair if the gap is inside the session
  * window, then replaces the state. The x135 matrix/lift finishing
  * arithmetic runs ON READ over the emitted pair stream (a
  * |types|²-sized aggregation at any volume) — the same split as the
  * burst monitor (AnomalyStream): pure-append pair extraction in the
  * stream, window margins on the bounded read side.
  *
  * State is one record per active user and expires via event-time
  * timeout once the watermark passes lastTs+gap — an idle user costs
  * nothing forever. In-batch ordering uses (ts, event_id), the exact
  * tiebreak the batch window uses, so stream == batch pairs
  * (TransitionStreamSpec pins it).
  */
object TransitionStream {

  final case class EvIn(user_id: Long, event_id: Long, event_type: String,
                        ts: Timestamp)
  final case class LastEvent(epoch: Long, eventId: Long, eventType: String)
  final case class Transition(user_id: Long, prev_type: String,
                              next_type: String)

  def transitions(events: Dataset[EvIn], gapMinutes: Int = 30,
                  watermark: String = "1 hour"): Dataset[Transition] = {
    val gapSec = gapMinutes * 60L
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val outEnc = Encoders.product[Transition]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[EvIn], state: GroupState[LastEvent]) => {
          if (batch.isEmpty && state.hasTimedOut) {
            // the watermark passed lastTs+gap: nothing after this event
            // can pair with it — drop the state, emit nothing
            state.remove()
            Iterator.empty
          } else {
            val out = Seq.newBuilder[Transition]
            var last = state.getOption
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val epoch = e.ts.getTime / 1000
              last.foreach { p =>
                if (epoch - p.epoch <= gapSec)
                  out += Transition(userId, p.eventType, e.event_type)
              }
              last = Some(LastEvent(epoch, e.event_id, e.event_type))
            }
            last.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp((p.epoch + gapSec) * 1000 + 1)
            }
            out.result().iterator
          }
        })
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.AnomalyOps

/** Live burst monitoring — the online half of the x124 contract: as
  * events arrive, the per-(type, hour) count table updates in ONE
  * sum-shaped stateful aggregation (state is |types|×|hours| longs —
  * bounded by the retention the serving store applies, not by event
  * volume). The burst VERDICT is computed on read by
  * [[AnomalyOps.burstsFromHourly]] — the same densify + trailing-window
  * + integer cross-multiply tree as the batch gate, over a relation
  * that is tiny by construction. Trailing-frame window functions are
  * not stream-legal, and pushing them into the stream would be the
  * wrong shape anyway: the baseline re-reads 24 rows of state, not the
  * event stream.
  *
  * Stream == batch: the count transform is shared verbatim, so the live
  * table on any prefix is byte-identical to [[AnomalyOps.hourlyCounts]]
  * over the same rows, and verdict-on-read equals the batch
  * [[AnomalyOps.burstReport]] — AnomalyStreamSpec pins both.
  */
object AnomalyStream {

  /** Streaming hourly-count table: (event_type, hour_epoch, cnt). Also
    * correct on a batch frame — how the spec pins stream == batch. */
  def hourlyOnIngest(events: DataFrame): DataFrame =
    AnomalyOps.hourlyCounts(events)

  /** x166's live half: CUSUM changepoint verdict ON READ over the same
    * streamed hourly panel — one state table serves both monitors (x124
    * asks which hour spiked, x166 where the level shifted), and the
    * finishing read is the batch code verbatim. */
  def changepoints(hourly: DataFrame): DataFrame =
    AnomalyOps.changepointFromHourly(hourly)

  /** Burst verdict over a (live or batch) hourly-count table. */
  def bursts(hourly: DataFrame, trailing: Int = 24, thresholdX: Int = 3,
             minBaseline: Int = 12, topK: Int = 20): DataFrame =
    AnomalyOps.burstsFromHourly(hourly, trailing, thresholdX, minBaseline,
      topK)
}

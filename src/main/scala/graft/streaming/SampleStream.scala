package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HashFunctions

/** Streaming per-stratum bottom-k sampling — the ingest-time twin of the
  * batch heap aggregate (`SamplingOps.bottomKSampleAgg`): every stratum
  * keeps its k smallest `(hash60(key), key)` pairs as
  * `flatMapGroupsWithState` state, so a training-data pipeline holds a
  * live, deterministic quota sample of everything ingested so far
  * without ever re-scanning the corpus.
  *
  * Emission (Update mode): whenever a batch CHANGES a stratum's sample,
  * the stratum's full current sample is re-emitted under an incremented
  * `version` — consumers keep max-version rows per stratum. Unchanged
  * strata emit nothing.
  *
  * Scale/state: O(k) longs per stratum in the state store (partitioned
  * by stratum), O(batch) work per trigger, no timeout (a sample never
  * expires). Determinism matches the batch aggregate exactly: total
  * order `(hash, id)`, so stream-vs-batch equality is spec-pinned
  * (SampleStreamSpec) regardless of arrival order or batching. */
object SampleStream {

  final case class DocIn(stratum: String, h: Long, id: Long)
  final case class SampleState(version: Long, hs: Seq[Long], ids: Seq[Long])
  final case class PickOut(stratum: String, version: Long, h: Long, doc_id: Long)

  def bottomKStream(docs: DataFrame, k: Int, seed: Int = 0,
                    stratum: Column = col("lang"),
                    key: Column = col("doc_id")): Dataset[PickOut] = {
    require(k > 0)
    implicit val inEnc = Encoders.product[DocIn]
    implicit val stEnc = Encoders.product[SampleState]
    implicit val outEnc = Encoders.product[PickOut]
    docs
      .select(stratum.cast("string").as("stratum"),
        HashFunctions.hash60(key, seed).as("h"), key.cast("long").as("id"))
      .as[DocIn]
      .groupByKey(_.stratum)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (strat: String, batch: Iterator[DocIn], state: GroupState[SampleState]) => {
          val cur = state.getOption.getOrElse(SampleState(0L, Nil, Nil))
          val have = cur.hs.zip(cur.ids)
          // arrival order is irrelevant: merge + total (h, id) sort + cut
          val merged = (have ++ batch.map(d => (d.h, d.id)))
            .distinct.sorted.take(k)
          if (merged == have) Iterator.empty
          else {
            val next = SampleState(cur.version + 1,
              merged.map(_._1), merged.map(_._2))
            state.update(next)
            merged.iterator.map { case (h, id) =>
              PickOut(strat, next.version, h, id)
            }
          }
        })
  }
}

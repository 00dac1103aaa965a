package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HashFunctions

/** Streaming per-stratum priority sampling — the ingest-time twin of
  * the batch weighted sampler (`SamplingOps.prioritySample`): every
  * stratum keeps the k LARGEST-priority docs (priority = weight / u,
  * the Duffield–Lund–Thorup key) as `flatMapGroupsWithState` state, so
  * a pipeline holds a live, length-weighted sample of everything
  * ingested so far — the docs that dominate the token bill — without
  * re-scanning the corpus.
  *
  * Emission (Update mode): whenever a batch CHANGES a stratum's
  * sample, the full current sample re-emits under an incremented
  * `version` — consumers keep max-version rows per stratum. Unchanged
  * strata emit nothing (the SampleStream contract).
  *
  * Determinism matches the batch operator exactly: priority is ONE
  * IEEE division over (native token count, hash60(seed|id)+1), total
  * order (priority desc, doc_id), so stream-vs-batch equality holds
  * regardless of arrival order or batch boundaries (PriorityStreamSpec).
  *
  * Scale/state: O(k) longs per stratum, O(batch) work per trigger, no
  * timeout (a sample never expires); strata partition the state store. */
object PriorityStream {

  final case class DocIn(stratum: String, doc_id: Long, weight: Long, u: Long)
  final case class PState(version: Long, ids: Seq[Long], ws: Seq[Long],
                          us: Seq[Long])
  final case class PickOut(stratum: String, version: Long, doc_id: Long,
                           weight: Long, priority: Double)

  def prioritySampleStream(docs: DataFrame, k: Int, seed: Int = 7,
                           stratum: Column = col("lang"),
                           key: Column = col("doc_id"),
                           text: Column = col("text")): Dataset[PickOut] = {
    require(k > 0)
    implicit val inEnc = Encoders.product[DocIn]
    implicit val stEnc = Encoders.product[PState]
    implicit val outEnc = Encoders.product[PickOut]
    docs
      .select(stratum.cast("string").as("stratum"),
        key.cast("long").as("doc_id"),
        graft.functions.TextExpressions.wsTokenCountFast(text)
          .cast("long").as("weight"),
        (HashFunctions.hash60(key, seed) + lit(1L)).as("u"))
      .filter(col("weight") > 0)
      .as[DocIn]
      .groupByKey(_.stratum)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (strat: String, batch: Iterator[DocIn], state: GroupState[PState]) => {
          val cur = state.getOption.getOrElse(PState(0L, Nil, Nil, Nil))
          val have = cur.ids.indices
            .map(i => (cur.ids(i), cur.ws(i), cur.us(i))).toList
          // arrival order is irrelevant: merge + total (priority desc,
          // id) sort + cut — the exact batch-operator order
          val merged = (have ++ batch.map(d => (d.doc_id, d.weight, d.u)))
            .distinct
            .sortBy { case (id, w, u) => (-(w.toDouble / u.toDouble), id) }
            .take(k)
          if (merged == have) Iterator.empty
          else {
            val next = PState(cur.version + 1, merged.map(_._1),
              merged.map(_._2), merged.map(_._3))
            state.update(next)
            merged.iterator.map { case (id, w, u) =>
              PickOut(strat, next.version, id, w, w.toDouble / u.toDouble)
            }
          }
        })
  }
}

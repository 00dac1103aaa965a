package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SubstringOps

/** Decontamination on ingest — the online twin of
  * [[graft.operators.SubstringOps.ngramDecontamination]] (the GPT-3 /
  * PaLM exact w-gram collision check): arriving documents are windowed
  * with the SAME stride-1 hashing as the batch gate and matched against
  * the offline eval-set window table, so a contaminated document is
  * flagged the moment it arrives instead of in the next offline sweep.
  *
  * The eval window table is static and joins stream-static (broadcast
  * each micro-batch — no join state); the per-doc re-collapse groups by
  * (doc_id, ts) under the event-time watermark, so aggregation state is
  * O(arrival rate × horizon) and rows emit in append mode once the
  * watermark passes — the [[ScoreStream]] state contract. Documents
  * shorter than w tokens yield no windows and hence no output row: the
  * batch gate skips them identically (they cannot carry a full w-gram).
  *
  * Also correct on a batch `docs` (the watermark is a no-op), which is
  * how the spec pins stream == batch.
  */
object DecontaminationStream {

  /** Offline half: the distinct eval-set window hashes, computed once
    * from the quarantined eval corpus with the batch windowing. */
  def evalWindows(evalDocs: DataFrame, w: Int = 8): DataFrame =
    SubstringOps.windows(evalDocs, w, col("text"))
      .select(col("whash")).distinct()
      .select(col("whash"), lit(1).as("__hit"))

  /** `docs` must carry `doc_id`, `text`, and an event-time `ts`. Output:
    * (doc_id, ts, n_windows, hit_windows, contaminated) — identical
    * arithmetic to the batch gate. */
  def gateOnIngest(docs: DataFrame, evalWins: DataFrame, w: Int = 8,
                   watermark: String = "1 hour"): DataFrame =
    SubstringOps.windows(docs.withWatermark("ts", watermark), w,
        col("text"), keyNames = Seq("doc_id", "ts"))
      .join(broadcast(evalWins), Seq("whash"), "left_outer")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L)).as("hit_windows"))
      .select(col("doc_id"), col("ts"), col("n_windows"), col("hit_windows"),
        when(col("hit_windows") > 0, 1).otherwise(0).as("contaminated"))
}

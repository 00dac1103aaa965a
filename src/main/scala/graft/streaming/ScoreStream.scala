package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming LM scoring on ingest — the online twin of
  * [[graft.operators.TextOps.lmScore]]: arriving documents are scored
  * against an OFFLINE-trained unigram cost table (train on the curated
  * corpus, score the firehose — the CCNet deployment shape; the model
  * comes from [[graft.operators.TextOps.lmModel]]).
  *
  * The cost table joins stream-static (broadcast each micro-batch, no
  * join state); out-of-vocabulary tokens take the model's cnt = 0
  * smoothing cost rather than silently dropping — an inner join would
  * skew scores LOW on exactly the weird documents the filter exists to
  * catch. The per-doc re-collapse after the explode groups by
  * (doc_id, ts) under the event-time watermark, so aggregation state is
  * O(arrival rate × horizon) and rows emit in append mode once the
  * watermark passes — the same state-bound contract as
  * [[DedupStream.dedupOnIngest]].
  */
object ScoreStream {

  /** `docs` must carry `doc_id`, `text`, and an event-time `ts`. Output:
    * (doc_id, ts, n_tokens, nll_micro, avg_nll) — identical columns and
    * arithmetic to the batch scorer, so online and offline scores are
    * directly comparable. Also correct on a batch `docs` (the watermark
    * is a no-op there), which is how the spec pins stream == batch. */
  def scoreOnIngest(docs: DataFrame, costs: DataFrame, oovCostMicro: Long,
                    watermark: String = "1 hour"): DataFrame =
    docs.withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.TextOps.wordsRe(col("text"))).as("token"))
      .join(broadcast(costs), Seq("token"), "left_outer")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("cost_micro"), lit(oovCostMicro))).as("nll_micro"))
      .select(col("doc_id"), col("ts"), col("n_tokens"), col("nll_micro"),
        (col("nll_micro").cast("double") / col("n_tokens").cast("double")
          / lit(1e6)).as("avg_nll"))
}

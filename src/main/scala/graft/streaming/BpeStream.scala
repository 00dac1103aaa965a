package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{BpeOps, TextOps}

/** True-subword accounting on ingest — the online twin of
  * [[BpeOps.applyCounts]]: a frozen trained merge table prices every
  * arriving document in real subword tokens (the cost a trainer will
  * actually pay for it), at micro-batch latency.
  *
  * Because BPE APPLICATION is a pure function of the word (the chained
  * greedy merges of [[BpeOps.segmented]]), the stream needs no lexicon
  * join and has NO out-of-vocabulary gap at all — a word never seen in
  * training still segments deterministically under the frozen merges
  * (worst case: all characters survive as singleton symbols). That makes
  * this stream stateless below the per-doc re-collapse: explode words,
  * segment inline (codegen'd replaces), count separators, aggregate per
  * (doc_id, ts) under the event-time watermark — state is O(arrival
  * rate × horizon), nothing keyed by vocabulary.
  *
  * Arithmetic is identical to the batch applier (same initial
  * segmentation, same merge order, same separator counting), so batch
  * rows and streamed rows agree exactly — BpeStreamSpec pins it. */
object BpeStream {

  /** `docs` must carry `doc_id`, `text`, and an event-time `ts`. Output:
    * (doc_id, ts, n_words, n_subwords, fertility). */
  def countOnIngest(docs: DataFrame, model: BpeOps.BpeModel,
                    watermark: String = "1 hour"): DataFrame = {
    // native single-call segmentation (stateless map — same expression
    // the batch path compiles); wrapped symbols carry 2 separators each
    val seg = BpeOps.segmentedNative(model, col("word"))
    docs.withWatermark("ts", watermark)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("ts"),
        explode(TextOps.wordsRe(col("text"))).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(BpeOps.SEP))
      .select(col("doc_id"), col("ts"),
        ((length(seg) - length(replace(seg, lit(BpeOps.SEP), lit(""))))
          .cast("long") / lit(2L)).cast("long").as("n_sub"))
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
      .select(col("doc_id"), col("ts"), col("n_words"), col("n_subwords"),
        (col("n_subwords").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }
}

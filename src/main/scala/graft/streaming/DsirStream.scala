package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextExpressions}
import graft.operators.{CurationOps, TextOps}

/** DSIR weighting on ingest — the online twin of
  * [[graft.operators.CurationOps.dsirWeights]]: train the bucket model
  * offline on the curated corpus ([[CurationOps.dsirModel]]), score the
  * firehose as it arrives — the importance-resampling deployment shape
  * (Xie et al. 2023 select raw-corpus docs that look like the target;
  * the selection weight is exactly this score).
  *
  * The weight table is `buckets`-sized and joins stream-static
  * (broadcast each micro-batch, no join state); features hashing into
  * buckets the training corpus never touched take the model's
  * zero-count default rather than dropping — the [[ScoreStream]] OOV
  * contract, bucket-flavored. Per-doc re-collapse groups by (doc_id,
  * ts) under the event-time watermark — state is O(arrival rate ×
  * horizon). Also correct on a batch `docs`, which is how the spec pins
  * stream == [[CurationOps.dsirApply]].
  */
object DsirStream {

  /** `docs` must carry `doc_id`, `text`, and an event-time `ts`. Output:
    * (doc_id, ts, n_feats, dsir_micro, dsir_avg) — identical arithmetic
    * to the batch applier. */
  def weightOnIngest(docs: DataFrame, weights: DataFrame,
                     defaultMicro: Long, buckets: Int = 4096,
                     watermark: String = "1 hour"): DataFrame = {
    val toks = TextOps.wordsRe(col("text"))
    val feats = concat(toks, TextExpressions.wsBigramsFast(col("text")))
    docs.withWatermark("ts", watermark)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("ts"), explode(feats).as("feat"))
      .select(col("doc_id"), col("ts"),
        coalesce(HashFunctions.polyHash52Fast(col("feat")) % lit(buckets.toLong),
          lit(0L)).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left_outer")
      .groupBy(col("doc_id"), col("ts"))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w_micro"), lit(defaultMicro))).as("dsir_micro"))
      .select(col("doc_id"), col("ts"), col("n_feats"), col("dsir_micro"),
        (col("dsir_micro").cast("double") /
          (col("n_feats").cast("double") * lit(1e6))).as("dsir_avg"))
  }
}

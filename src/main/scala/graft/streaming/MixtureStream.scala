package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions
import graft.operators.CurationOps

/** Live mixture/budget monitoring on ingest — the online twin of
  * [[graft.operators.CurationOps.mixturePlan]]: as documents arrive, the
  * per-language token availability accumulates in ONE stateful
  * aggregation (state = one row per language, bounded by language
  * cardinality, no watermark needed), and each update re-prices the
  * epoch factor against the target mixture. The read a mixture designer
  * watches during a crawl: the `oversubscribed` flag flipping to 0 is
  * the moment a slice has collected enough tokens to stop repeating.
  *
  * The finishing arithmetic is [[CurationOps.mixtureFinish]] — the same
  * expression tree as the batch planner, so online and offline epoch
  * numbers can never drift. Run with `outputMode("complete")` (the
  * aggregate is language-sized); also correct on a batch `docs`, which
  * is how the spec pins stream == batch.
  */
object MixtureStream {

  /** `docs` must carry `lang` and `text`. Output columns and arithmetic
    * are identical to the batch planner's. */
  def planOnIngest(docs: DataFrame,
                   weights: Seq[(String, Double)] = CurationOps.defaultMixture,
                   budget: Long = 1000000L): DataFrame =
    CurationOps.mixtureFinish(
      docs.filter(col("lang").isNotNull)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextExpressions.wsTokenCountFast(col("text")).cast("long"))
            .as("avail_tokens")),
      weights, budget)
}

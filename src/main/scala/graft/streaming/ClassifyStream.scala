package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.ClassifyOps.NbPrior

/** Streaming Naive Bayes classification on ingest — the online twin of
  * [[graft.operators.ClassifyOps.nbLangScore]]: train the model offline
  * on the curated corpus ([[graft.operators.ClassifyOps.nbModel]]),
  * classify the firehose as it arrives (the fastText-gate deployment
  * shape — route/drop documents by predicted class before they reach
  * the batch pipeline).
  *
  * The dense cost table joins stream-static (broadcast each micro-batch,
  * no join state). A matched token carries one row per candidate class;
  * an out-of-vocabulary token matches nothing and surfaces as ONE row
  * with a null class, counted once and priced at each class's own
  * cnt = 0 smoothing cost — inner-joining would silently skew exactly
  * the foreign-language documents the classifier exists to catch.
  *
  * Structured Streaming permits one stateful aggregation per query, so
  * the per-class scores pivot into COLUMNS of a single (doc_id, ts)
  * aggregation (classes are fixed at train time) and the argmin is a
  * stateless CASE over those attributes — no second stateful operator,
  * no window function. State is O(arrival rate × watermark horizon),
  * the [[DedupStream]] contract.
  */
object ClassifyStream {

  /** `docs` must carry `doc_id`, `text`, and an event-time `ts`. Output:
    * (doc_id, ts, n_tokens, pred_lang, nll_micro) — same prediction and
    * micro-nat arithmetic as the batch scorer under the same model. Also
    * correct on a batch `docs` (the watermark is a no-op), which is how
    * the spec pins stream == batch. */
  def classifyOnIngest(docs: DataFrame, dense: DataFrame,
                       priors: Seq[NbPrior],
                       watermark: String = "1 hour"): DataFrame = {
    require(priors.nonEmpty, "nbModel produced no classes")
    val langs = priors.sortBy(_.lang)
    val joined = docs.withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.TextOps.wordsRe(col("text"))).as("token"))
      .join(broadcast(dense), Seq("token"), "left_outer")
    // one aggregation: per-class conditional cost sums + the OOV tally.
    // n_tokens = matched tokens (each contributes |classes| rows — count
    // only the first class's) + OOV tokens (one null-class row each).
    val aggs =
      sum(when(col("cand_lang").isNull, 1L).otherwise(0L)).as("n_oov") +:
      sum(when(col("cand_lang") === langs.head.lang, 1L).otherwise(0L))
        .as("n_matched") +:
      langs.map(p => sum(when(col("cand_lang") === p.lang, col("cost_micro")))
        .as(s"c_${p.lang}"))
    val scored = joined.groupBy(col("doc_id"), col("ts"))
      .agg(aggs.head, aggs.tail: _*)
    val nlls: Seq[(String, Column)] = langs.map { p =>
      p.lang -> (lit(p.priorMicro) + coalesce(col(s"c_${p.lang}"), lit(0L)) +
        col("n_oov") * lit(p.oovMicro))
    }
    val mn = least(nlls.map(_._2): _*)
    val pick = nlls.foldRight(lit(langs.head.lang)) { case ((l, s), el) =>
      when(s === mn, lit(l)).otherwise(el)
    }
    scored.select(col("doc_id"), col("ts"),
      (col("n_matched") + col("n_oov")).as("n_tokens"),
      pick.as("pred_lang"), mn.as("nll_micro"))
  }
}

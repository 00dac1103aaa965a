package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.operators.DictTagOps

/** Live dictionary-audit counters — the x143 streaming twin: as
  * documents arrive, the per-term `(n_docs, n_occ)` tallies update in
  * ONE stateful sum-aggregation over the dense per-doc count vectors
  * ([[graft.functions.AcExpressions.acTermCounts]], one automaton pass
  * per arriving doc, |D| grouped rows per doc whatever the match
  * volume). State is |D| rows of two longs — bounded by the dictionary,
  * not the stream, no watermark needed.
  *
  * Both tallies are SUMS, so the live table over any arrival prefix is
  * row-identical to the batch [[DictTagOps.dictionaryTags]] over the
  * same rows (the merge law in streaming clothes — DictTagStreamSpec
  * pins it per micro-batch), and absent terms hold their zero rows from
  * the first document on. Like the CMS counters and unlike HLL's
  * idempotent max, sums COUNT replays: deliver exactly-once
  * (checkpointed source offsets) or dedup upstream on doc_id. */
object DictTagStream {

  /** Streaming per-term tally table `(term_id, term, n_docs, n_occ)`.
    * Also correct on a batch frame — that is how the spec pins
    * stream == batch. */
  def tagsOnIngest(df: DataFrame, terms: Seq[String] = DictTagOps.gateTerms,
                   text: Column = col("text")): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "dictionary must be non-empty and duplicate-free")
    DictTagOps.dictionaryTags(df, terms, text)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The production ENTRY POINT of the incremental-admission stack — one
  * call that takes an arriving shard and the two persisted indexes and
  * emits the per-content admission manifest a 100 TB ingest acts on,
  * composing the tiers in precedence order:
  *
  *   1. `reject_exact` — the content's fingerprint is already indexed
  *      ([[NearDupIndex]] exact tier; its batch copies feed the
  *      rejections ledger when the shard is committed);
  *   2. `reject_near` — a band collision's signature estimate reaches
  *      the threshold (the x174 sketch decision);
  *   3. `trim_spans` — admitted as a DOCUMENT, but ≥ `heavyNum/heavyDen`
  *      of its tokens sit under already-seen w-token windows
  *      ([[SpanIndex]] bill): ship it through span-level cutting
  *      (x73/x181), not whole — the remix/copy-paste population the
  *      signature tier admits whole (x190's finding cell);
  *   4. `admit` — novel at every tier; `tokens_retained` is what it
  *      adds to the post-dedup corpus.
  *
  * One row per DISTINCT incoming content (the x174 contraction
  * granularity): `(doc_id, content_hash, n_batch_copies, decision,
  * best_est_ppm, n_tokens, tokens_cut, tokens_retained)`. Span columns
  * are 0 for sub-window docs (nothing to trim by construction).
  *
  * Scale: exactly the union of its parts — each index touched once
  * (the near-dup probe O(|batch| + collisions), the span probe one
  * postings scan under a broadcast batch-hash set), one rep-keyed
  * join between the two verdict relations, output batch-sized. */
object ShardAdmission {

  def report(batch: DataFrame, nearDupRoot: String, spanRoot: String,
             minMatches: Int = NearDupIndex.defaultMinMatches,
             w: Int = SpanIndex.defaultW,
             heavyNum: Int = 1, heavyDen: Int = 2,
             text: Column = col("text")): DataFrame = {
    val near = NearDupIndex.admit(batch, nearDupRoot, minMatches, text)
    val span = SpanIndex.admitBill(batch, spanRoot, w, text)
      .select(col("doc_id"), col("n_tokens"), col("tokens_cut"))
    val t = coalesce(col("n_tokens"), lit(0L))
    val c = coalesce(col("tokens_cut"), lit(0L))
    near.join(span, Seq("doc_id"), "left")
      .select(col("doc_id"), col("content_hash"), col("n_batch_copies"),
        when(col("verdict") === "dup_exact", lit("reject_exact"))
          .when(col("verdict") === "dup_near", lit("reject_near"))
          .when(t > 0L && c * heavyDen >= t * heavyNum, lit("trim_spans"))
          .otherwise(lit("admit")).as("decision"),
        col("best_est_ppm"), t.as("n_tokens"), c.as("tokens_cut"),
        (t - c).as("tokens_retained"))
  }

  /** DuckDB twin over the gate's 80/20 split: both tiers' static
    * replay twins nested as CTEs, composed by the same precedence. */
  def reportSql(minMatches: Int = NearDupIndex.defaultMinMatches,
                w: Int = SpanIndex.defaultW,
                heavyNum: Int = 1, heavyDen: Int = 2): String =
    s"""WITH sa_n AS (
       |${NearDupIndex.admissionSql(minMatches)}
       |), sa_s AS (
       |${SpanIndex.admissionSql(w)}
       |)
       |SELECT n.doc_id, n.content_hash, n.n_batch_copies,
       |  CASE WHEN n.verdict = 'dup_exact' THEN 'reject_exact'
       |       WHEN n.verdict = 'dup_near' THEN 'reject_near'
       |       WHEN coalesce(s.n_tokens, 0) > 0
       |         AND coalesce(s.tokens_cut, 0) * $heavyDen
       |           >= coalesce(s.n_tokens, 0) * $heavyNum
       |         THEN 'trim_spans'
       |       ELSE 'admit' END AS decision,
       |  n.best_est_ppm,
       |  CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(s.tokens_cut, 0) AS BIGINT) AS tokens_cut,
       |  CAST(coalesce(s.n_tokens, 0) - coalesce(s.tokens_cut, 0)
       |    AS BIGINT) AS tokens_retained
       |FROM sa_n n LEFT JOIN sa_s s USING (doc_id)""".stripMargin
}

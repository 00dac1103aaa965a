package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps.{wordsRe, wordsReSql}

/** Corpus-trained classification — the fastText-shaped quality/language
  * gate of a curation pipeline, reduced to its deterministic core: a
  * multinomial Naive Bayes classifier whose training IS a pair of
  * count aggregations, so the whole train+score loop stays inside the
  * engine (no model runtime, no driver-side state beyond plan constants).
  *
  * NB with add-one smoothing: cost(t|l) = −ln p(t|l) =
  * ln((T_l + V)/(c_{l,t} + 1)), prior(l) = ln(N/N_l); a document's
  * class score is prior + Σ occ·cost, argmin wins. All costs snap to
  * integer micro-nats (the lmScore determinism contract) and per-doc
  * sums are exact BIGINT, so both engines agree bit-for-bit.
  */
object ClassifyOps {

  /** x75: train a Naive Bayes language model on the labeled corpus and
    * score every document against all classes — resubstitution
    * evaluation (train == eval), the standard smoke test a pipeline
    * runs on its own labels; a held-out variant only changes the
    * training predicate, as [[TextOps.backoffLmScore]] demonstrates.
    *
    * Scale shape: the (doc, lang, token) occurrence matrix is ONE
    * corpus tokenization feeding both training counts and scoring via
    * exchange reuse (doc_id/lang pre-filtered non-null at the base so
    * downstream join-inferred constraints cannot split the subtrees —
    * the x70 trap); the per-class token table is vocab×L and the dense
    * smoothed cost table broadcasts back onto the matrix (shuffle-join
    * it on an open-vocab corpus). The winner is picked by a rank-1
    * window per doc — Spark plans WindowGroupLimit, keeping one row
    * per doc map-side before the final shuffle. */
  private case class NbParts(matrix: DataFrame, langTok: DataFrame,
                             langTot: DataFrame, dense: DataFrame)

  private def nbParts(df: DataFrame): NbParts = {
    val w = Window.partitionBy()
    val base = df.filter(col("doc_id").isNotNull && col("lang").isNotNull)
    val matrix = base
      .select(col("doc_id"), col("lang"), explode(wordsRe(col("text"))).as("token"))
      .groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("occ"))
    val langTok = matrix.groupBy("lang", "token").agg(sum("occ").as("clt"))
    val langTot = langTok.groupBy("lang").agg(sum("clt").as("tl"))
    // the clt >= 1 filter is a tautology on counts, but it REFERENCES the
    // aggregated column: without it RemoveRedundantAggregates collapses
    // the keys-only matrix→langTok→distinct(token) chain into a fresh
    // corpus-wide tokenize+distinct (observed: a second Generate + scan at
    // runtime), bypassing the ReusedExchange that already holds langTok —
    // one more corpus pass at 100 TB for a vocab-sized derivation
    val vocabV = langTok.filter(col("clt") >= 1L)
      .groupBy("token").agg(count(lit(1)).as("nl"))
      .select(col("token"), count(lit(1)).over(w).as("v"))
    val dense = vocabV.crossJoin(broadcast(langTot))
      .join(langTok, Seq("token", "lang"), "left_outer")
      .select(col("token"), col("lang").as("cand_lang"),
        floor(log((col("tl") + col("v")).cast("double") /
          (coalesce(col("clt"), lit(0L)) + lit(1L)).cast("double"))
          * lit(1e6) + lit(0.5)).as("cost_micro"))
    NbParts(matrix, langTok, langTot, dense)
  }

  /** One trained class: log-prior and the cost an out-of-vocabulary token
    * takes under this class's smoothing (cnt = 0 → ln(T_l + V)). */
  case class NbPrior(lang: String, priorMicro: Long, oovMicro: Long)

  /** Offline-trained model for the streaming twin
    * ([[graft.streaming.ClassifyStream]]): the dense (token, class) cost
    * table plus per-class priors and OOV costs. The collect is L rows —
    * a train-time driver action, not per-batch work (the [[TextOps.lmModel]]
    * contract). */
  def nbModel(df: DataFrame): (DataFrame, Seq[NbPrior]) = {
    val w = Window.partitionBy()
    val p = nbParts(df)
    val base = df.filter(col("doc_id").isNotNull && col("lang").isNotNull)
    val vCount = p.langTok.filter(col("clt") >= 1L)
      .groupBy("token").agg(count(lit(1)).as("nl"))
      .agg(count(lit(1)).as("v"))
    val pri = base.groupBy("lang").agg(count(lit(1)).as("nl"))
      .select(col("lang"),
        floor(log(sum("nl").over(w).cast("double") / col("nl").cast("double"))
          * lit(1e6) + lit(0.5)).as("prior_micro"))
      .join(p.langTot, "lang")
      .crossJoin(broadcast(vCount))
      .select(col("lang"), col("prior_micro"),
        floor(log((col("tl") + col("v")).cast("double")) * lit(1e6) + lit(0.5))
          .as("oov_micro"))
    val priors = pri.collect().map(r =>
      NbPrior(r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        .sortBy(_.lang)
    (p.dense, priors)
  }

  def nbLangScore(df: DataFrame): DataFrame = {
    val w = Window.partitionBy()
    val base = df.filter(col("doc_id").isNotNull && col("lang").isNotNull)
    val p = nbParts(df)
    val priors = base.groupBy("lang").agg(count(lit(1)).as("nl"))
      .select(col("lang").as("cand_lang"),
        floor(log(sum("nl").over(w).cast("double") / col("nl").cast("double"))
          * lit(1e6) + lit(0.5)).as("prior_micro"))
    val scores = p.matrix.join(broadcast(p.dense), "token")
      .groupBy("doc_id", "lang", "cand_lang")
      .agg(sum(col("occ") * col("cost_micro")).as("tok_micro"))
      .join(broadcast(priors), "cand_lang")
      .select(col("doc_id"), col("lang"), col("cand_lang"),
        (col("tok_micro") + col("prior_micro")).as("nll_micro"))
    val byDoc = Window.partitionBy("doc_id")
      .orderBy(col("nll_micro"), col("cand_lang"))
    scores.withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"),
        col("cand_lang").as("pred_lang"), col("nll_micro"),
        when(col("lang") === col("cand_lang"), 1).otherwise(0).as("is_correct"))
  }

  /** DuckDB twin of [[nbLangScore]]. */
  def nbLangScoreSql: String =
    s"""WITH nb_m AS (
       |  SELECT doc_id, lang, token, count(*) AS occ
       |  FROM (SELECT doc_id, lang, unnest(${wordsReSql("text")}) AS token
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND lang IS NOT NULL)
       |  GROUP BY doc_id, lang, token
       |),
       |nb_lt AS (
       |  SELECT lang, token, CAST(sum(occ) AS BIGINT) AS clt
       |  FROM nb_m GROUP BY lang, token
       |),
       |nb_tl AS (SELECT lang, CAST(sum(clt) AS BIGINT) AS tl FROM nb_lt GROUP BY lang),
       |nb_v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM nb_lt),
       |nb_vocab AS (SELECT DISTINCT token FROM nb_lt),
       |nb_dense AS (
       |  SELECT vo.token, t.lang AS cand_lang,
       |    CAST(floor(ln(CAST(t.tl + nb_v.v AS DOUBLE)
       |        / CAST(coalesce(l.clt, 0) + 1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |      AS cost_micro
       |  FROM nb_vocab vo CROSS JOIN nb_tl t CROSS JOIN nb_v
       |  LEFT JOIN nb_lt l ON l.token = vo.token AND l.lang = t.lang
       |),
       |nb_pr AS (
       |  SELECT lang AS cand_lang,
       |    CAST(floor(ln(CAST(n AS DOUBLE) / CAST(nl AS DOUBLE)) * 1e6 + 0.5)
       |      AS BIGINT) AS prior_micro
       |  FROM (SELECT lang, count(*) AS nl, sum(count(*)) OVER () AS n
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND lang IS NOT NULL
       |        GROUP BY lang)
       |),
       |nb_s AS (
       |  SELECT m.doc_id, m.lang, d.cand_lang,
       |    CAST(sum(m.occ * d.cost_micro) AS BIGINT) AS tok_micro
       |  FROM nb_m m JOIN nb_dense d USING (token)
       |  GROUP BY m.doc_id, m.lang, d.cand_lang
       |)
       |SELECT s.doc_id, s.lang, s.cand_lang AS pred_lang,
       |  s.tok_micro + p.prior_micro AS nll_micro,
       |  CASE WHEN s.lang = s.cand_lang THEN 1 ELSE 0 END AS is_correct
       |FROM nb_s s JOIN nb_pr p USING (cand_lang)
       |QUALIFY row_number() OVER (PARTITION BY s.doc_id
       |  ORDER BY s.tok_micro + p.prior_micro, s.cand_lang) = 1""".stripMargin

  /** x106: confusion matrix of the x75 classifier — per (true, predicted)
    * language counts and the row-normalized share, the standard
    * classification-eval read beside x75's scalar accuracy (WHICH
    * languages leak into which tells you whether to fix the model or the
    * labels; x93 reports the label-noise half of that story).
    *
    * Determinism: counts are exact; the share is one IEEE division of
    * exact integers. Scale: a lang²-bounded aggregate over the x75
    * scoring output — the classifier's cost dominates, this adds one
    * tiny shuffle. */
  def nbConfusion(df: DataFrame): DataFrame =
    nbLangScore(df)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_true",
        sum(col("n")).over(Window.partitionBy("lang")))
      .select(col("lang"), col("pred_lang"), col("n"), col("n_true"),
        (col("n").cast("double") / col("n_true").cast("double")).as("share"))

  /** DuckDB twin of [[nbConfusion]]. */
  def nbConfusionSql: String =
    s"""WITH nbc_scores AS (
       |${nbLangScoreSql.replace("\n", "\n  ")}
       |)
       |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(count(*)) OVER (PARTITION BY lang) AS BIGINT) AS n_true,
       |  CAST(count(*) AS DOUBLE)
       |    / CAST(sum(count(*)) OVER (PARTITION BY lang) AS DOUBLE) AS share
       |FROM nbc_scores
       |GROUP BY lang, pred_lang""".stripMargin
}

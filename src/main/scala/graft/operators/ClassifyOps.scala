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
    // V via 1-row aggregate + broadcast (x49 convention) — the vocab
    // relation grows with corpus content, so an empty-partitionBy
    // window over it would funnel it into one task; both consumers of
    // vocabTok sit above the same (token)-keyed exchange
    val vocabTok = langTok.filter(col("clt") >= 1L)
      .groupBy("token").agg(count(lit(1)).as("nl"))
    val vocabV = vocabTok.select(col("token"))
      .crossJoin(broadcast(vocabTok.agg(count(lit(1)).as("v"))))
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

  /** x125: margin-calibration (reliability) table of the x75 classifier —
    * does a bigger decision margin actually mean a more trustworthy
    * prediction? Docs bucket by the NLL gap between the best and
    * second-best class (one nat per bin, top bin open-ended) and each
    * bin reports its size, accuracy, and mean margin. A well-calibrated
    * gate shows accuracy rising monotonically with margin — that read
    * is what justifies margin-thresholded auto-labeling downstream
    * (keep bin ≥ b, route the rest to review).
    *
    * The margin replaces softmax confidence deliberately: posteriors
    * need a float exp-sum whose partition order Spark does not fix,
    * while margins are EXACT integer micro-nats (monotone in the
    * 2-class posterior anyway). Scale: the x75 scoring output reduced
    * by a rank-≤2 window (WindowGroupLimit — two rows per doc survive
    * map-side), then a bins-sized aggregate.
    *
    * Output: (margin_bin, n_docs, n_correct, acc, mean_margin_micro). */
  def nbMarginCalibration(df: DataFrame, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 64, s"bins=$bins")
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
    val perDoc = scores.withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") <= 2)
      .groupBy("doc_id", "lang")
      .agg(max(when(col("rn") === 1, col("cand_lang"))).as("pred_lang"),
        max(when(col("rn") === 1, col("nll_micro"))).as("best_micro"),
        max(when(col("rn") === 2, col("nll_micro"))).as("second_micro"))
      // a single-class corpus has no runner-up, hence no margin story
      .filter(col("second_micro").isNotNull)
      .select(col("lang"), col("pred_lang"),
        (col("second_micro") - col("best_micro")).as("margin_micro"))
    perDoc
      .select(col("lang"), col("pred_lang"), col("margin_micro"),
        least(expr("margin_micro div 1000000L"), lit(bins.toLong - 1))
          .as("margin_bin"))
      .groupBy("margin_bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang") === col("pred_lang"), 1L).otherwise(0L))
          .as("n_correct"),
        sum(col("margin_micro")).as("sum_margin"))
      .select(col("margin_bin"), col("n_docs"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs").cast("double"))
          .as("acc"),
        expr("sum_margin div n_docs").as("mean_margin_micro"))
  }

  /** DuckDB twin of [[nbMarginCalibration]]. */
  def nbMarginCalibrationSql(bins: Int = 10): String =
    s"""WITH nbm_m AS (
       |  SELECT doc_id, lang, token, count(*) AS occ
       |  FROM (SELECT doc_id, lang, unnest(${wordsReSql("text")}) AS token
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND lang IS NOT NULL)
       |  GROUP BY doc_id, lang, token
       |),
       |nbm_lt AS (
       |  SELECT lang, token, CAST(sum(occ) AS BIGINT) AS clt
       |  FROM nbm_m GROUP BY lang, token
       |),
       |nbm_tl AS (SELECT lang, CAST(sum(clt) AS BIGINT) AS tl FROM nbm_lt GROUP BY lang),
       |nbm_v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM nbm_lt),
       |nbm_vocab AS (SELECT DISTINCT token FROM nbm_lt),
       |nbm_dense AS (
       |  SELECT vo.token, t.lang AS cand_lang,
       |    CAST(floor(ln(CAST(t.tl + nbm_v.v AS DOUBLE)
       |        / CAST(coalesce(l.clt, 0) + 1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
       |      AS cost_micro
       |  FROM nbm_vocab vo CROSS JOIN nbm_tl t CROSS JOIN nbm_v
       |  LEFT JOIN nbm_lt l ON l.token = vo.token AND l.lang = t.lang
       |),
       |nbm_pr AS (
       |  SELECT lang AS cand_lang,
       |    CAST(floor(ln(CAST(n AS DOUBLE) / CAST(nl AS DOUBLE)) * 1e6 + 0.5)
       |      AS BIGINT) AS prior_micro
       |  FROM (SELECT lang, count(*) AS nl, sum(count(*)) OVER () AS n
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND lang IS NOT NULL
       |        GROUP BY lang)
       |),
       |nbm_s AS (
       |  SELECT m.doc_id, m.lang, d.cand_lang,
       |    CAST(sum(m.occ * d.cost_micro) + any_value(p.prior_micro) AS BIGINT)
       |      AS nll_micro
       |  FROM nbm_m m JOIN nbm_dense d USING (token)
       |  JOIN nbm_pr p ON p.cand_lang = d.cand_lang
       |  GROUP BY m.doc_id, m.lang, d.cand_lang
       |),
       |nbm_rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY nll_micro, cand_lang) AS rn
       |  FROM nbm_s
       |),
       |nbm_doc AS (
       |  SELECT doc_id, lang,
       |    max(CASE WHEN rn = 1 THEN cand_lang END) AS pred_lang,
       |    max(CASE WHEN rn = 1 THEN nll_micro END) AS best_micro,
       |    max(CASE WHEN rn = 2 THEN nll_micro END) AS second_micro
       |  FROM nbm_rk WHERE rn <= 2
       |  GROUP BY doc_id, lang
       |)
       |SELECT margin_bin, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_correct,
       |  CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS acc,
       |  CAST(sum(second_micro - best_micro) // count(*) AS BIGINT)
       |    AS mean_margin_micro
       |FROM (
       |  SELECT lang, pred_lang,
       |    least((second_micro - best_micro) // 1000000, ${bins - 1})
       |      AS margin_bin,
       |    second_micro, best_micro
       |  FROM nbm_doc WHERE second_micro IS NOT NULL)
       |GROUP BY margin_bin""".stripMargin

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

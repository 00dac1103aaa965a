package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over the documents corpus — the read side a
  * training-data pipeline needs for corpus exploration and targeted
  * selection ("pull the top-k docs about X").
  *
  * BM25 (Robertson/Sparck Jones; the Lucene-default scoring function):
  * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))` with
  * `idf(t) = ln(1 + (N-df+0.5)/(df+0.5))`.
  *
  * Scale shape: the query term set is tiny and FIXED, so per-doc term
  * frequencies are narrow array ops on the token array (no explode, no
  * per-term shuffle); the global statistics (N, Σdl, per-term df) are ONE
  * single-row aggregate broadcast back to the scan; top-k is
  * TakeOrderedAndProject. One scan + one scalar agg at any corpus size —
  * never a term-posting shuffle.
  *
  * Cross-engine determinism (the gate hashes every value):
  *   - all aggregates are BIGINT (exact); `avgdl` is a single division of
  *     two exact BIGINTs → bit-identical doubles on both engines;
  *   - the per-term score sum is written in FIXED left-assoc order on
  *     both sides (a float groupBy-sum would be order-nondeterministic);
  *   - `ln` probed bit-identical (Java `Math.log` vs DuckDB `ln`, glibc
  *     on both) on this corpus's idf range; scores are additionally
  *     integerized to micros (`floor(x·1e6+0.5)`) so a last-ulp
  *     divergence cannot flip the hash;
  *   - double literals are rendered via exact decimal strings
  *     (`CAST('2.2' AS DOUBLE)`) so DuckDB never routes them through
  *     DECIMAL arithmetic.
  */
object RetrievalOps {

  /** Fixed query for the gate row: three common corpus terms whose tf/dl
    * interplay produces a full ranking. */
  val defaultTerms: Seq[String] = Seq("hash", "join", "vector")

  /** Exact decimal-string double literal (same nearest-double on both
    * engines; avoids DuckDB's DECIMAL literal typing). */
  private def dlit(x: Double): String = s"CAST('$x' AS DOUBLE)"

  /** x49: BM25 top-k. Output (doc_id, score_micro BIGINT), score
    * descending, doc_id tiebreak. */
  def bm25TopK(df: DataFrame, terms: Seq[String] = defaultTerms,
               k: Int = 20, k1: Double = 1.2, b: Double = 0.75,
               text: Column = col("text")): DataFrame = {
    require(terms.nonEmpty)
    val base = df
      .select(col("doc_id"), TextOps.words(text).as("toks"))
      .select(
        col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
          terms.indices.map { i =>
            size(filter(col("toks"), w => w === lit(terms(i))))
              .cast("long").as(s"tf_$i")
          }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    def idf(i: Int): Column = ln(lit(1.0) +
      (col("n_docs").cast("double") - col(s"df_$i").cast("double") + lit(0.5)) /
        (col(s"df_$i").cast("double") + lit(0.5)))
    def termScore(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      idf(i) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }
    val score = terms.indices.map(termScore).reduceLeft(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(score * lit(1e6) + lit(0.5)).cast("long").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB twin of [[bm25TopK]] — same expression tree, same
    * association order, same literal rendering. */
  def bm25TopKSql(terms: Seq[String] = defaultTerms, k: Int = 20,
                  k1: Double = 1.2, b: Double = 0.75): String = {
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, w -> w = '$t')) AS BIGINT) AS tf_$i"
    }.mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
      .mkString(", ")
    val avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    def idf(i: Int): String =
      s"ln(${dlit(1.0)} + (CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + ${dlit(0.5)})" +
        s" / (CAST(df_$i AS DOUBLE) + ${dlit(0.5)}))"
    def termScore(i: Int): String =
      s"${idf(i)} * (CAST(tf_$i AS DOUBLE) * ${dlit(k1 + 1.0)})" +
        s" / (CAST(tf_$i AS DOUBLE) + ${dlit(k1)} * (${dlit(1.0 - b)}" +
        s" + ${dlit(b)} * (CAST(dl AS DOUBLE) / $avgdl)))"
    val score = terms.indices.map(termScore).mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
       |), stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl, $dfCols
       |  FROM base
       |)
       |SELECT doc_id,
       |  CAST(floor(($score) * ${dlit(1e6)} + ${dlit(0.5)}) AS BIGINT) AS score_micro
       |FROM base, stats
       |ORDER BY score_micro DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** x101: hybrid lexical+vector retrieval via reciprocal-rank fusion
    * (Cormack et al. 2009): the standard RAG-stack shape — a BM25 top-n
    * list and an embedding-cosine top-n list (query = the embedding of a
    * fixed corpus vector, documents and embeddings being id-aligned),
    * fused as rrf(d) = Σ_lists 1/(rrfK + rank_d). Absent-from-list
    * contributes nothing; ranks are reported with 0 = absent.
    *
    * Determinism: both per-list ranks are total orders over micro-snapped
    * scores with id tiebreaks; the RRF sum is two correctly-rounded IEEE
    * divisions added in fixed order, micro-snapped once at the end.
    *
    * Scale: each list is a TakeOrderedAndProject cut over ONE corpus scan
    * (no global sort — the rank window runs over the n survivors on a
    * single tiny partition); the query vector broadcasts; the fusion
    * join touches ≤ 2n rows. At 100 TB the cost is exactly two corpus
    * scans — one lexical, one vector — which a production deployment
    * would serve from the x45 inverted index and the x18 IVF index
    * respectively; this operator is the exact fusion semantics those
    * accelerated paths must reproduce. */
  def hybridRrf(docs: DataFrame, emb: DataFrame,
                terms: Seq[String] = defaultTerms, queryVecId: Long = 42L,
                n: Int = 50, k: Int = 20, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rankW = (s: Column, id: Column) =>
      row_number().over(Window.orderBy(s.desc, id)).cast("long")
    val lex = bm25TopK(docs, terms, n)
      .select(col("doc_id"),
        rankW(col("score_micro"), col("doc_id")).as("rank_lex"))
    val qv = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    val cos = SimilarityOps.dot(col("embedding"), col("qv")) /
      (sqrt(SimilarityOps.dot(col("embedding"), col("embedding"))) *
        sqrt(SimilarityOps.dot(col("qv"), col("qv"))))
    val vec = emb.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        floor(cos * lit(1e6) + lit(0.5)).cast("long").as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("doc_id")).limit(n)
      .select(col("doc_id"),
        rankW(col("cos_micro"), col("doc_id")).as("rank_vec"))
    val contrib = (r: Column) =>
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + r.cast("double")), lit(0.0))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
        coalesce(col("rank_vec"), lit(0L)).as("rank_vec"),
        floor((contrib(col("rank_lex")) + contrib(col("rank_vec"))) *
          lit(1e6) + lit(0.5)).cast("long").as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id")).limit(k)
  }

  /** DuckDB twin of [[hybridRrf]] — same list construction (micro-snap →
    * LIMIT n → rank over the survivors), same fixed-order fusion. */
  def hybridRrfSql(terms: Seq[String] = defaultTerms, queryVecId: Long = 42L,
                   n: Int = 50, k: Int = 20, rrfK: Int = 60): String = {
    val e = "CAST(e.embedding AS DOUBLE[])"
    val cosSql = s"list_dot_product($e, q.qv) / " +
      s"(sqrt(list_dot_product($e, $e)) * sqrt(list_dot_product(q.qv, q.qv)))"
    def contrib(r: String): String =
      s"coalesce(${dlit(1.0)} / (${dlit(rrfK.toDouble)} + CAST($r AS DOUBLE)), ${dlit(0.0)})"
    s"""WITH rrf_lex AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
       |      AS BIGINT) AS rank_lex
       |  FROM (
       |${bm25TopKSql(terms, n).replace("\n", "\n    ")}
       |  )
       |),
       |rrf_q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
       |          FROM embeddings WHERE vec_id = $queryVecId),
       |rrf_vec AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY cos_micro DESC, doc_id)
       |      AS BIGINT) AS rank_vec
       |  FROM (
       |    SELECT e.vec_id AS doc_id,
       |      CAST(floor($cosSql * ${dlit(1e6)} + ${dlit(0.5)}) AS BIGINT)
       |        AS cos_micro
       |    FROM embeddings e CROSS JOIN rrf_q q
       |    ORDER BY cos_micro DESC, doc_id
       |    LIMIT $n
       |  )
       |)
       |SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
       |  coalesce(l.rank_lex, 0) AS rank_lex,
       |  coalesce(v.rank_vec, 0) AS rank_vec,
       |  CAST(floor((${contrib("l.rank_lex")} + ${contrib("v.rank_vec")})
       |    * ${dlit(1e6)} + ${dlit(0.5)}) AS BIGINT) AS rrf_micro
       |FROM rrf_lex l FULL OUTER JOIN rrf_vec v ON l.doc_id = v.doc_id
       |ORDER BY rrf_micro DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** x131: batch self-retrieval evaluation — MRR@k and hit rates of BM25
    * over a query fleet derived from the corpus itself (each query doc's
    * `nTerms` RAREST tokens by corpus df, ties (fpos, token) — the
    * discriminative self-query; relevance oracle = the doc itself, the
    * standard zero-annotation retrieval smoke test). A sub-1 MRR
    * localizes WHERE lexical retrieval loses its own documents: docs
    * whose rarest terms are still corpus-shared — template farms and
    * near-dup clusters. (First-token queries were tried and score ~0.16
    * MRR on the synthetic corpus — openings are boilerplate; that IS a
    * finding, but the rare-term fleet is the evaluation a retrieval
    * stack actually tunes against.)
    *
    * Scale shape — deliberately different from x49's fixed-query scan:
    * this is the BATCH-of-queries shape. The doc×token matrix computes
    * dl as a WINDOW sum over its (doc_id) partition — bounded by a
    * single doc's distinct-token count — but df comes from a
    * map-side-combinable `groupBy(token).count` joined back on token:
    * on any Zipf corpus the top token's posting list is ~the corpus,
    * so a token-partitioned window is a guaranteed single-task cliff
    * (the round-11 `weak`), while the df aggregate is vocab-sized and
    * its join-back AQE-skew-splittable. The query
    * term fleet is rank-limited per query and BROADCASTS onto the
    * matrix (posting lists probe map-side, they never shuffle), and the
    * (query, doc) score aggregate + rank window share one exchange.
    * Per-term contributions snap to micro BIGINTs before the sum (a
    * float groupBy-sum would be partition-order-dependent — the x67
    * contract); reciprocal ranks are exact `1e6 div rank`.
    *
    * Output: 1 row (n_queries, hits_at_1, hits_at_k, mrr_micro). */
  def selfRetrievalEval(df: DataFrame, queryPred: Column, nTerms: Int = 3,
                        k: Int = 10, k1: Double = 1.2,
                        b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nTerms >= 1 && nTerms <= 16 && k >= 1, s"nTerms=$nTerms k=$k")
    val toks = df
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(TextOps.words(col("text"))).as(Seq("pos", "token")))
    // matrix feeds three branches (df aggregate, the stats join, the
    // corpus totals) and withStats two (query-term fleet, scoring) —
    // pinned (round 18, guide §2.4) so the corpus is tokenized and
    // aggregated once per invocation, not once per branch
    val matrix = graft.operators.DedupOps.Local.pin(
      toks.groupBy("doc_id", "token")
        .agg(count(lit(1)).as("tf"), min(col("pos")).as("fpos")))
    val dfCounts = matrix.groupBy("token").agg(count(lit(1)).as("dfr"))
    val withStats = graft.operators.DedupOps.Local.pin(matrix
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy("doc_id")))
      .join(dfCounts, Seq("token")))
    val corpus = matrix.agg(
      countDistinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("sum_dl"))
    val qterms = withStats.filter(queryPred)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("dfr"), col("fpos"), col("token"))))
      .filter(col("rn") <= nTerms)
      .select(col("doc_id").as("qid"), col("token"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = ln(lit(1.0) +
      (col("n_docs").cast("double") - col("dfr").cast("double") + lit(0.5)) /
        (col("dfr").cast("double") + lit(0.5)))
    val tfD = col("tf").cast("double")
    val contrib = idf * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val scored = withStats.join(broadcast(qterms), Seq("token"))
      .crossJoin(broadcast(corpus))
      .select(col("qid"), col("doc_id"),
        floor(contrib * lit(1e6) + lit(0.5)).cast("long").as("c_micro"))
    val ranked = scored.groupBy("qid", "doc_id")
      .agg(sum(col("c_micro")).as("s"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("s").desc, col("doc_id"))))
      .filter(col("rank") <= k)
    val nQ = qterms.agg(countDistinct(col("qid")).as("n_queries"))
    val selfHits = ranked.filter(col("doc_id") === col("qid"))
      .agg(coalesce(sum(when(col("rank") === 1, 1L).otherwise(0L)), lit(0L))
          .as("hits_at_1"),
        count(lit(1)).as("hits_at_k"),
        coalesce(sum(expr("1000000L div rank")), lit(0L)).as("sum_rr"))
    nQ.crossJoin(selfHits)
      .select(col("n_queries"), col("hits_at_1"), col("hits_at_k"),
        when(col("n_queries") > 0L, expr("sum_rr div n_queries"))
          .otherwise(lit(0L)).as("mrr_micro"))
  }

  /** DuckDB twin of [[selfRetrievalEval]]; `queryPred` over (doc_id,
    * token, tf, fpos). */
  /** DuckDB cost-model query: Σ df over the x131 query fleet's probe
    * terms — the exact posting mass the broadcast-probe join scans
    * (x131's only superlinear risk; the matrix build is linear).
    * tools/scale_smoke.py bounds x131's time growth by it. */
  def probeMassSql(queryPred: String = "doc_id % 50 = 0",
                   nTerms: Int = 16): String =
    s"""WITH pm_toks AS (
       |  SELECT doc_id,
       |    CAST(unnest(generate_series(1, len(toks))) AS BIGINT) AS pos,
       |    unnest(toks) AS token
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND text IS NOT NULL)
       |), pm_m AS (
       |  SELECT doc_id, token, min(pos) AS fpos
       |  FROM pm_toks GROUP BY doc_id, token
       |), pm_df AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS dfr FROM pm_m
       |  GROUP BY token
       |), pm_q AS (
       |  SELECT doc_id, token FROM (
       |    SELECT m.doc_id, m.token, row_number() OVER (PARTITION BY m.doc_id
       |      ORDER BY d.dfr, m.fpos, m.token) AS rn
       |    FROM pm_m m JOIN pm_df d USING (token) WHERE $queryPred)
       |  WHERE rn <= $nTerms
       |)
       |SELECT CAST(coalesce(sum(d.dfr), 0) AS BIGINT) AS mass
       |FROM pm_q q JOIN pm_df d USING (token)""".stripMargin

  def selfRetrievalEvalSql(queryPred: String, nTerms: Int = 3, k: Int = 10,
                           k1: Double = 1.2, b: Double = 0.75): String = {
    val avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val idf = s"ln(${dlit(1.0)} + (CAST(n_docs AS DOUBLE) - CAST(dfr AS DOUBLE)" +
      s" + ${dlit(0.5)}) / (CAST(dfr AS DOUBLE) + ${dlit(0.5)}))"
    val contrib = s"$idf * (CAST(tf AS DOUBLE) * ${dlit(k1 + 1.0)})" +
      s" / (CAST(tf AS DOUBLE) + ${dlit(k1)} * (${dlit(1.0 - b)}" +
      s" + ${dlit(b)} * (CAST(dl AS DOUBLE) / $avgdl)))"
    s"""WITH sr_toks AS (
       |  SELECT doc_id,
       |    CAST(unnest(generate_series(1, len(toks))) AS BIGINT) AS pos,
       |    unnest(toks) AS token
       |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
       |        FROM documents
       |        WHERE doc_id IS NOT NULL AND text IS NOT NULL)
       |), sr_m AS (
       |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf,
       |    CAST(min(pos) AS BIGINT) AS fpos
       |  FROM sr_toks GROUP BY doc_id, token
       |), sr_ws AS (
       |  SELECT *, CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl,
       |    CAST(count(*) OVER (PARTITION BY token) AS BIGINT) AS dfr
       |  FROM sr_m
       |), sr_corpus AS (
       |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |    CAST(sum(tf) AS BIGINT) AS sum_dl
       |  FROM sr_m
       |), sr_q AS (
       |  SELECT doc_id AS qid, token FROM (
       |    SELECT doc_id, token, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY dfr, fpos, token) AS rn
       |    FROM sr_ws WHERE $queryPred)
       |  WHERE rn <= $nTerms
       |), sr_scored AS (
       |  SELECT q.qid, w.doc_id,
       |    CAST(floor(($contrib) * ${dlit(1e6)} + ${dlit(0.5)}) AS BIGINT)
       |      AS c_micro
       |  FROM sr_ws w JOIN sr_q q USING (token), sr_corpus
       |), sr_ranked AS (
       |  SELECT qid, doc_id,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY sum(c_micro) DESC, doc_id) AS rank
       |  FROM sr_scored GROUP BY qid, doc_id
       |  QUALIFY rank <= $k
       |), sr_nq AS (
       |  SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_queries FROM sr_q
       |), sr_hits AS (
       |  SELECT
       |    CAST(COALESCE(sum(CASE WHEN rank = 1 THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS hits_at_1,
       |    CAST(count(*) AS BIGINT) AS hits_at_k,
       |    CAST(COALESCE(sum(1000000 // rank), 0) AS BIGINT) AS sum_rr
       |  FROM sr_ranked WHERE doc_id = qid
       |)
       |SELECT n_queries, hits_at_1, hits_at_k,
       |  CASE WHEN n_queries > 0 THEN sum_rr // n_queries ELSE 0 END
       |    AS mrr_micro
       |FROM sr_nq, sr_hits""".stripMargin
  }
}

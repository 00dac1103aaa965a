package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DedupOps.{IterState, Local}

/** Distributed spectral analysis of the embedding matrix — bounded-round
  * POWER ITERATION for the top singular direction, in exact integer
  * arithmetic so both engines (and any partition order) agree
  * bit-for-bit. The top component is the curation read behind
  * "one direction explains most of the corpus": a dominant λ means the
  * embedding space is anisotropic (common with contrastive encoders —
  * the all-ones/frequency direction), which inflates cosine similarities
  * uniformly and argues for mean-centering or component removal before
  * x11/x52-style thresholding.
  *
  * Iteration: v ← normalize(Xᵀ(Xv)), v₀ = all-ones — the textbook von
  * Mises scheme, each half-step one equi-join + one aggregate:
  * d = Xv is a doc-sized shuffle on vec_id, w = Xᵀd a dim-sized shuffle
  * on pos (the SAME two-shuffle-per-round shape as [[GraphOps.pageRank]],
  * with [[DedupOps.IterState]] pinning to keep lineage flat).
  *
  * Determinism & overflow: elements snap to 1e4 ints at load (the
  * sourceCohesion contract) and v to 1e6 units per round. The d vector
  * shrinks by 2²⁰ (sign·magnitude floor — engine-portable for negatives,
  * where raw `div`/`//` disagree) before re-projection. Worst-case
  * envelope: |x| ≤ 1e4 and |d/2²⁰| ≤ 64·1e4·1e6/2²⁰ ≈ 6.1e5, so
  * per-row products reach ~6.1e9 and the BIGINT w-sum holds to
  * n ≈ 1.5e9 docs — past that, widen the shrink (each extra shift bit
  * doubles the bound at ~1 bit of precision) or sum w in
  * DECIMAL(38,0)/HUGEINT like λ below. Re-normalization divides by
  * max|w|/1e6 in exact integers, then ONE fixed-form IEEE
  * division+sqrt+floor per element snaps the unit vector. λ comes from
  * the final Rayleigh quotient with the d² products summed in
  * DECIMAL(38,0)/HUGEINT (exact at any corpus size).
  */
object SpectralOps {

  /** Sign-preserving floor-magnitude division: both engines truncate
    * non-negative integer division identically; raw negative `div`
    * (Spark, toward zero) vs `//` (DuckDB, toward −∞) do not. */
  private def shr(c: String, by: String): String =
    s"CASE WHEN $c < 0 THEN -((-($c)) div $by) ELSE ($c) div $by END"

  /** Top spectral direction of the (uncentered) embedding matrix after
    * `rounds` power iterations: 64 rows (pos, v_micro, lambda_unit) —
    * the unit direction in 1e-6 units plus the Rayleigh eigenvalue
    * estimate λ = ‖Xv‖²/‖v‖² in squared 1e-4-snap units, identical on
    * every row. */
  def topComponent(emb: DataFrame, rounds: Int = 4,
                   state: IterState = Local): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds=$rounds")
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    // co-partition the matrix ONCE on the key every round re-keys by:
    // d's groupBy(vec_id) and the m⋈ds re-projection join both need
    // hashpartitioning(vec_id), so pinning the layout once removes each
    // round's two fact-sized Exchanges of m outright — the per-round
    // shuffles left are the 64-row pos aggregate and the 1-row
    // scale/norm aggregates (guide §2.4: operations keyed the same way
    // share one exchange; here it is paid once at pin time for ALL
    // rounds). Row-level results are unchanged: every aggregate is an
    // exact integer sum, so partition placement cannot move a bit.
    val m = DedupOps.pinPartitioned(state, emb
      .filter(col("vec_id").isNotNull)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "ev")))
      .select(col("vec_id"), col("pos"),
        floor(col("ev").cast("double") * lit(1e4) + lit(0.5)).cast("long")
          .as("x")), "vec_id")
    var v = m.select(col("pos")).distinct()
      .select(col("pos"), lit(1000000L).as("v"))
    var lambda: DataFrame = null
    for (r <- 1 to rounds) {
      val d = m.join(broadcast(v), Seq("pos"))
        .groupBy("vec_id").agg(sum(col("x") * col("v")).as("d"))
      if (r == rounds) {
        // Rayleigh numerator from THIS round's projections (exact):
        // λ = Σd² / Σv² with d = X·v_{r-1}
        val num = d.agg(sum(col("d").cast(dec) * col("d").cast(dec)).as("num"))
        val den = v.agg(sum(col("v") * col("v")).as("den"))
        lambda = num.crossJoin(den).select(
          floor(col("num").cast("double") / col("den").cast("double") +
            lit(0.5)).cast("long").as("lambda_unit"))
      }
      val ds = d.select(col("vec_id"), expr(shr("d", "1048576L")).as("ds"))
      // shuffle_hash on the co-partitioned doc-sized side: with m's pin
      // carrying hashpartitioning(vec_id) this joins exchange-free AND
      // sort-free (SMJ would re-sort the whole matrix every round); the
      // per-partition build side is 1/P of the doc vector — bounded
      val w = state.pin(m.join(ds.hint("shuffle_hash"), Seq("vec_id"))
        .groupBy("pos").agg(sum(col("x") * col("ds")).as("w")))
      // PIN THE 64-ROW w, DERIVE v LAZILY (round 19): the round's one
      // eager job is the matrix walk ending in the dim-sized aggregate.
      // Pinning v instead (the round-18 shape) made the same job execute
      // the w subtree ~3× — the scale and n2 broadcast builds each
      // re-ran it, and once the fact Exchanges were gone there was no
      // ReusedExchange node left to dedupe them (measured: x127 3.4 s →
      // 9.1 s on the co-partitioning change alone). With w pinned, the
      // scale/n2/v algebra is 64-row arithmetic wherever it is
      // re-derived, and each round performs exactly ONE pass over m.
      val scale = w.agg(greatest(expr("max(abs(w)) div 1000000L"), lit(1L))
        .as("wscale"))
      val sRel = w.crossJoin(broadcast(scale))
        .select(col("pos"), expr(shr("w", "wscale")).as("sv"))
      val n2 = sRel.agg(sum(col("sv") * col("sv")).as("n2"))
      v = sRel.crossJoin(broadcast(n2)).select(col("pos"),
        when(col("n2") > 0L,
          floor(col("sv").cast("double") /
            sqrt(col("n2").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("v"))
    }
    v.crossJoin(broadcast(lambda))
      .select(col("pos").cast("long").as("pos"), col("v").as("v_micro"),
        col("lambda_unit"))
  }

  /** x128: anisotropy-corrected near-dup audit (Mu & Viswanath 2018's
    * "all-but-the-top", reduced to its rank-1 core): every x11 candidate
    * pair re-scored with the top spectral direction projected out —
    * cos'(a,b) over a′ = a − (a·v/v·v)v, expanded so NO corrected vector
    * is ever materialized: a′·b′ = a·b − (a·v)(b·v)/(v·v) and
    * ‖a′‖² = a·a − (a·v)²/(v·v). A pair whose similarity collapses under
    * correction was near-duplicate only in the shared anisotropic
    * direction — the false-positive class cosine-threshold dedup (x52)
    * inherits from contrastive encoders.
    *
    * Scale shape: the quadratic half is delegated to
    * [[SimilarityOps.cosineDupPairsTiled]] (no BNLJ, no driver corpus);
    * the correction itself is one O(n·d) feature scan (v broadcasts as a
    * 1-row array relation) plus two equi-joins on the surviving pairs.
    * Determinism: v/v·v are exact integers from [[topComponent]]; each
    * corrected cosine is a fixed-form IEEE expression rounded to 9
    * digits (the x11 contract). Cauchy–Schwarz holds only up to float
    * error for a snapped v, so residual norms guard > 0 (NULL past it —
    * a vector parallel to v has no corrected direction). */
  def correctedDupPairs(emb: DataFrame, dir: DataFrame,
                        threshold: Double): DataFrame = {
    val vRel = dir.agg(
      expr("transform(array_sort(collect_list(struct(pos, v_micro))), " +
        "x -> CAST(x.v_micro AS DOUBLE))").as("v"),
      greatest(sum(col("v_micro") * col("v_micro")), lit(1L)).as("vv"))
    val feat = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .crossJoin(broadcast(vRel))
      .select(col("vec_id"), col("e"),
        SimilarityOps.dot(col("e"), col("v")).as("dv"),
        SimilarityOps.dot(col("e"), col("e")).as("ee"), col("vv"))
    val pairs = SimilarityOps.cosineDupPairsTiled(emb, threshold)
    pairs
      .join(feat.select(col("vec_id").as("vec_a"), col("e").as("ea"),
        col("dv").as("da"), col("ee").as("eea")), Seq("vec_a"))
      .join(feat.select(col("vec_id").as("vec_b"), col("e").as("eb"),
        col("dv").as("db"), col("ee").as("eeb"), col("vv")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("cos_sim"),
        SimilarityOps.dot(col("ea"), col("eb")).as("ab"),
        col("da"), col("db"), col("eea"), col("eeb"), col("vv"))
      .select(col("vec_a"), col("vec_b"), col("cos_sim"),
        when((col("eea") - col("da") * col("da") / col("vv")) > 0d &&
             (col("eeb") - col("db") * col("db") / col("vv")) > 0d,
          round((col("ab") - col("da") * col("db") / col("vv")) /
            (sqrt(col("eea") - col("da") * col("da") / col("vv")) *
             sqrt(col("eeb") - col("db") * col("db") / col("vv"))), 9))
          .otherwise(lit(null).cast("double")).as("cos_corrected"))
  }

  /** DuckDB twin of [[correctedDupPairs]] over the gated direction. */
  def correctedDupPairsSql(threshold: Double, rounds: Int = 4,
                           dim: Int = 64): String = {
    val corr = s"(list_dot_product(a.e, b.e) - a.dv * b.dv / vv) / " +
      s"(sqrt(a.ee - a.dv * a.dv / vv) * sqrt(b.ee - b.dv * b.dv / vv))"
    s"""WITH cd_tc AS MATERIALIZED (
       |  SELECT * FROM (
       |${topComponentSql(rounds, dim).replace("\n", "\n    ")}
       |  )
       |), cd_v AS MATERIALIZED (
       |  SELECT list(CAST(v_micro AS DOUBLE) ORDER BY pos) AS v,
       |    CAST(greatest(sum(v_micro * v_micro), 1) AS BIGINT) AS vv
       |  FROM cd_tc
       |), cd_f AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    list_dot_product(CAST(embedding AS DOUBLE[]), v) AS dv,
       |    list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[])) AS ee
       |  FROM embeddings, cd_v
       |)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_dot_product(a.e, b.e) / (sqrt(a.ee) * sqrt(b.ee)), 9)
       |    AS cos_sim,
       |  CASE WHEN (a.ee - a.dv * a.dv / vv) > 0
       |        AND (b.ee - b.dv * b.dv / vv) > 0
       |    THEN round($corr, 9) ELSE NULL END AS cos_corrected
       |FROM cd_f a JOIN cd_f b ON a.vec_id < b.vec_id, cd_v
       |WHERE round(list_dot_product(a.e, b.e) / (sqrt(a.ee) * sqrt(b.ee)), 9)
       |  >= $threshold""".stripMargin
  }

  /** DuckDB twin of [[topComponent]] — the iteration unrolled round by
    * round with identical shrink/normalize arithmetic (1-based DuckDB
    * array index kept internal; output pos is 0-based).
    *
    * Every unrolled CTE is MATERIALIZED: DuckDB inlines plain CTEs,
    * and each round references its predecessors more than once
    * (sp_w→sp_n+sp_s, sp_s→sp_q+sp_v), so inlining re-derives the
    * whole upstream chain per reference — exponential in rounds.
    * Measured at sf0.01: 53.9 s inlined vs 0.09 s materialized,
    * identical rows; nested inside x128's pair join the inlined form
    * was 620 s — 80% of the entire 265-query driver gate, the
    * plausible cause of two straight empty CORRECTNESS artifacts. */
  def topComponentSql(rounds: Int = 4, dim: Int = 64): String = {
    def shrSql(c: String, by: String): String =
      s"CASE WHEN $c < 0 THEN -((-($c)) // $by) ELSE ($c) // $by END"
    val roundCtes = (1 to rounds).map { k =>
      s"""sp_d$k AS MATERIALIZED (
         |  SELECT m.vec_id, CAST(sum(m.x * v.v) AS BIGINT) AS d
         |  FROM sp_m m JOIN sp_v${k - 1} v USING (pos) GROUP BY m.vec_id),
         |sp_ds$k AS MATERIALIZED (
         |  SELECT vec_id, ${shrSql("d", "1048576")} AS ds FROM sp_d$k),
         |sp_w$k AS MATERIALIZED (
         |  SELECT m.pos, CAST(sum(m.x * s.ds) AS BIGINT) AS w
         |  FROM sp_m m JOIN sp_ds$k s USING (vec_id) GROUP BY m.pos),
         |sp_n$k AS MATERIALIZED (
         |  SELECT greatest(max(abs(w)) // 1000000, 1) AS wscale FROM sp_w$k),
         |sp_s$k AS MATERIALIZED (
         |  SELECT pos, ${shrSql("w", "wscale")} AS sv FROM sp_w$k, sp_n$k),
         |sp_q$k AS MATERIALIZED (
         |  SELECT CAST(sum(sv * sv) AS BIGINT) AS n2 FROM sp_s$k),
         |sp_v$k AS MATERIALIZED (
         |  SELECT pos, CASE WHEN n2 > 0 THEN
         |      CAST(floor(CAST(sv AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE))
         |        * 1e6 + 0.5) AS BIGINT)
         |    ELSE 0 END AS v
         |  FROM sp_s$k, sp_q$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH sp_m AS MATERIALIZED (
       |  SELECT vec_id, ix.i - 1 AS pos,
       |    CAST(floor(CAST(embedding[ix.i] AS DOUBLE) * 1e4 + 0.5)
       |      AS BIGINT) AS x
       |  FROM embeddings, generate_series(1, $dim) AS ix(i)
       |  WHERE vec_id IS NOT NULL AND ix.i <= len(embedding)
       |), sp_v0 AS MATERIALIZED (
       |  SELECT DISTINCT pos, CAST(1000000 AS BIGINT) AS v FROM sp_m
       |),
       |$roundCtes,
       |sp_lam AS (
       |  SELECT CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) + 0.5)
       |    AS BIGINT) AS lambda_unit
       |  FROM (SELECT sum(CAST(d AS HUGEINT) * d) AS num FROM sp_d$rounds),
       |       (SELECT CAST(sum(v * v) AS BIGINT) AS den FROM sp_v${rounds - 1})
       |)
       |SELECT CAST(pos AS BIGINT) AS pos, v AS v_micro, lambda_unit
       |FROM sp_v$rounds, sp_lam""".stripMargin
  }
}

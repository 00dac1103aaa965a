package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Everything here is keyed by a content-stable hash, never an RNG:
  * the same row lands in the same split/sample on every engine, every
  * run, every cluster size — the property that makes a 100 TB holdout
  * split reproducible and auditable (and lets DuckDB verify it exactly).
  * All operators are pure narrow projections/filters: no shuffle, no
  * driver state, trivially parallel over any partitioning.
  */
object SamplingOps {

  /** Percile bucket 0..99 of a key column: stable hash → [0, 100). */
  def hashBucket(key: Column, seed: Int = 0): Column =
    pmod(HashFunctions.hash60(key, seed), lit(100L))

  def hashBucketSql(expr: String, seed: Int = 0): String =
    s"((${HashFunctions.hash60Sql(expr, seed)}) % 100 + 100) % 100"

  /** Deterministic train/val/test assignment by hashed key: buckets
    * [0,train) → train, [train,train+val) → val, rest → test. The split
    * is a pure function of the key — adding or removing OTHER rows never
    * reassigns an existing one (unlike `randomSplit`, which depends on
    * partitioning and seed plumbing). */
  def trainValTest(df: DataFrame, key: Column, trainPct: Int = 90,
                   valPct: Int = 5, seed: Int = 0): DataFrame = {
    val b = hashBucket(key, seed)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic stratified sample: keep `pct`% per stratum, selected
    * by hash bucket — sampling rate is exact in expectation per stratum
    * and membership is content-stable. */
  def stratifiedSample(df: DataFrame, key: Column, pct: Int,
                       seed: Int = 0): DataFrame =
    df.filter(hashBucket(key, seed) < pct)

  // ---- query twins ---------------------------------------------------------

  /** x25: split the documents corpus 90/5/5 by doc_id and report per
    * (lang, split) counts + mean quality — the audit a training run logs
    * before consuming a split. One narrow projection + one small agg (the
    * per-row DECIMAL cast keeps the mean order-independent). */
  def splitReport(docs: DataFrame): DataFrame =
    trainValTest(docs, col("doc_id"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(TextOps.qualityScoreCol(col("text"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))).cast("double")
          / count(lit(1))).as("mean_quality"))

  /** x29: exact-quota stratified sample — exactly min(K, |stratum|) docs
    * per stratum, chosen by hash order (a reproducible "random" quota;
    * unlike the rate-based [[stratifiedSample]], the output size is
    * fixed, not expected). One window pass partitioned by stratum; at
    * 100 TB use [[quotaSamplePrefiltered]] — identical rows, the window
    * sorts ~K·headroom rows per stratum instead of the full corpus. */
  def quotaSample(df: DataFrame, stratum: Column, k: Int,
                  seed: Int = 0, key: Column = col("doc_id")): DataFrame = {
    // `key` must be unique per row (it is the hash input AND the
    // tie-break) — a duplicated key makes the quota pick nondeterministic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(HashFunctions.hash60(key, seed), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** The 100 TB form of [[quotaSample]] — same K rows, bounded sort.
    *
    * [[quotaSample]] keeps the K smallest `(hash, key)` pairs per
    * stratum, but its window sorts the WHOLE stratum. This version
    * pre-filters each stratum to a PREFIX of that sort order — rows with
    * `hash60(key) < t`, `t = H · (K·headroom)/n` over the hash space H,
    * sized from the exact per-stratum count — so the window sorts
    * ~K·headroom rows per stratum instead of all n. A hash-value prefix
    * (unlike a mod-bucket) preserves the sort order's head, so whenever
    * at least `min(K, n)` rows survive the filter they contain exactly
    * the K selected rows; a second count VERIFIES that per stratum, and
    * any under-quota stratum (vanishingly rare at the default headroom —
    * survivors are Binomial(n, K·headroom/n) — but data can collide
    * adversarially) falls back to its full rows. Equality with
    * [[quotaSample]] is therefore unconditional, and spec-pinned.
    *
    * Cost shape: two broadcast-sized count aggs (one row per stratum) +
    * one narrow filter + the same window over the shrunken input. */
  def quotaSamplePrefiltered(df: DataFrame, stratum: Column, k: Int,
                             seed: Int = 0, key: Column = col("doc_id"),
                             headroom: Double = 4.0): DataFrame = {
    val h = HashFunctions.hash60(key, seed)
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__stratum"), col("__n"),
        when(col("__n") <= lit(k * headroom), lit(Long.MaxValue))
          .otherwise((lit((1L << 60).toDouble) * lit(k * headroom) / col("__n"))
            .cast("long")).as("__t"))
    // null-safe key equality throughout: a NULL stratum is a legitimate
    // window partition in quotaSample, so the prefilter must not drop it
    val tagged = df.join(broadcast(counts), stratum <=> col("__stratum"))
    val pre = tagged.filter(h < col("__t"))
    val surv = pre.groupBy(col("__stratum").as("__s2")).agg(count(lit(1)).as("__m"))
    val okMap = counts.join(surv, col("__stratum") <=> col("__s2"), "left")
      .select(col("__stratum").as("__s3"),
        (coalesce(col("__m"), lit(0L)) >= least(lit(k.toLong), col("__n"))).as("__ok"))
    val input = pre
      .join(broadcast(okMap.filter(col("__ok")).select("__s3")),
        col("__stratum") <=> col("__s3"), "left_semi")
      .unionByName(tagged
        .join(broadcast(okMap.filter(!col("__ok")).select("__s3")),
          col("__stratum") <=> col("__s3"), "left_semi"))
      .drop("__stratum", "__n", "__t")
    quotaSample(input, stratum, k, seed, key)
  }

  /** x53: the AGGREGATE form of [[quotaSample]] — the same
    * min(K, |stratum|) hash-ordered picks per stratum with NO sort
    * anywhere: a custom `TypedImperativeAggregate`
    * ([[graft.functions.BottomKByHash]]) keeps a bounded (hash, id)
    * heap per group, partially aggregated map-side, so the shuffle
    * carries ≤ K pairs per stratum per map task and merge is heap
    * replay. Compare the window forms: [[quotaSample]] sorts the whole
    * stratum; [[quotaSamplePrefiltered]] bounds the sort but still
    * sorts and needs two pre-passes. This is one pass, O(K) state —
    * the form that wins when K ≪ stratum and strata are huge.
    * Returns the sample manifest `(stratum, h, doc_id)`; spec-pinned
    * row-identical to [[quotaSample]]'s selection. */
  def bottomKSampleAgg(df: DataFrame, k: Int, seed: Int = 0,
                       stratum: Column = col("lang"),
                       key: Column = col("doc_id")): DataFrame =
    df.select(stratum.as("stratum"),
        HashFunctions.hash60(key, seed).as("h"), key.cast("long").as("id"))
      .groupBy(col("stratum"))
      .agg(graft.functions.SampleAggregates
        .bottomKByHash(col("h"), col("id"), k).as("picks"))
      .select(col("stratum"), explode(col("picks")).as("p"))
      .select(col("stratum"), col("p.h").as("h"), col("p.id").as("doc_id"))

  /** DuckDB twin of [[bottomKSampleAgg]] — the window formulation IS the
    * oracle (the aggregate must equal it bit-for-bit). */
  def bottomKSampleAggSql(k: Int, seed: Int = 0): String =
    s"""SELECT lang AS stratum, h, doc_id FROM (
       |  SELECT lang, ${HashFunctions.hash60Sql("doc_id", seed)} AS h, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${HashFunctions.hash60Sql("doc_id", seed)}, doc_id) AS rn
       |  FROM documents) WHERE rn <= $k""".stripMargin

  def quotaSampleSql(k: Int, seed: Int = 0): String =
    s"""SELECT * EXCLUDE (rn) FROM (
       |  SELECT *, row_number() OVER (PARTITION BY lang
       |    ORDER BY ${HashFunctions.hash60Sql("doc_id", seed)}, doc_id) AS rn
       |  FROM documents
       |) WHERE rn <= $k""".stripMargin

  /** x37: token-budget sampling — per-stratum, keep docs in stable hash
    * order until the TOKEN budget fills (training mixtures are specified
    * in tokens, not document counts). A doc is kept when the cumulative
    * token total BEFORE it is still under budget, so the first
    * budget-crossing doc is included (same convention as [[packChunks]]
    * chunk straddling) and every stratum gets ≥1 doc when non-empty.
    * Same determinism contract as [[quotaSample]] (hash order, unique
    * key); same one-window shape, and the [[quotaSamplePrefiltered]]
    * hash-prefix recipe applies unchanged when a stratum dwarfs its
    * budget. */
  def tokenBudgetSample(df: DataFrame, stratum: Column, budgetTokens: Long,
                        seed: Int = 0, key: Column = col("doc_id")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(HashFunctions.hash60(key, seed), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("n_tokens",
        graft.functions.TextExpressions.wsTokenCountFast(col("text")).cast("long"))
      .withColumn("cum_excl", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_excl") < budgetTokens)
      .select(key.as("doc_id"), stratum.as("stratum"),
        col("n_tokens"), col("cum_excl"))
  }

  def tokenBudgetSampleSql(budgetTokens: Long, seed: Int = 0): String =
    s"""WITH t AS (
       |  SELECT doc_id, lang AS stratum,
       |    CAST(len(${TextOps.wordsReSql("text")}) AS BIGINT) AS n_tokens,
       |    ${HashFunctions.hash60Sql("doc_id", seed)} AS h
       |  FROM documents
       |)
       |SELECT doc_id, stratum, n_tokens,
       |  CAST(cum_excl AS BIGINT) AS cum_excl
       |FROM (
       |  SELECT doc_id, stratum, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY stratum ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
       |  FROM t
       |)
       |WHERE cum_excl < $budgetTokens""".stripMargin

  /** x27: mixture rebalancing — downsample every stratum to the size of
    * the smallest (uniform target mixture), choosing survivors by stable
    * hash so the subset is reproducible and monotone (a doc kept at rate
    * r stays kept at any rate ≥ r). Rates are exact integer percentiles:
    * stratum s keeps buckets `< floor(100·min_n/n_s)`, with a 1% rate
    * floor so no stratum's rate rounds to zero (how many docs actually
    * survive still depends on which buckets its keys hash to — a tiny
    * stratum can come up empty; pick the floor per corpus if that
    * matters). One small count agg broadcast back over the corpus — the
    * scan stays narrow.
    *
    * Reports per-stratum `n_docs` (input) and `n_kept` so the mixture
    * shift is auditable. */
  def mixtureRebalance(docs: DataFrame, stratum: Column = col("lang"),
                       seed: Int = 0): DataFrame = {
    val counts = docs.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min(col("n_docs")).as("min_n"))
    val rates = counts.crossJoin(minN)
      .select(col("stratum"), col("n_docs"),
        greatest(floor(lit(100) * col("min_n") / col("n_docs")).cast("long"),
          lit(1L)).as("keep_pct"))
    docs.select(stratum.as("stratum"), col("doc_id"))
      .join(broadcast(rates), Seq("stratum"))
      .filter(hashBucket(col("doc_id"), seed) < col("keep_pct"))
      .groupBy(col("stratum"), col("n_docs"), col("keep_pct"))
      .agg(count(lit(1)).as("n_kept"))
  }

  def mixtureRebalanceSql(seed: Int = 0): String =
    s"""WITH counts AS (
       |  SELECT lang AS stratum, count(*) AS n_docs FROM documents GROUP BY lang
       |), rates AS (
       |  SELECT stratum, n_docs,
       |    greatest(100 * (SELECT min(n_docs) FROM counts) // n_docs, 1) AS keep_pct
       |  FROM counts
       |)
       |SELECT r.stratum, r.n_docs, r.keep_pct, count(*) AS n_kept
       |FROM documents d
       |JOIN rates r ON r.stratum = d.lang
       |WHERE ${hashBucketSql("d.doc_id", seed)} < r.keep_pct
       |GROUP BY r.stratum, r.n_docs, r.keep_pct""".stripMargin

  /** x26: concat-and-chunk sequence packing — the pretraining-dataloader
    * shape: shard the corpus deterministically, order each shard, run a
    * cumulative token total, and chunk the concatenated token stream at a
    * fixed context length. Each doc gets `(shard, chunk_id, chunk_offset)`
    * — enough for a reader to reassemble every context window. Docs
    * straddle chunk boundaries exactly as pretraining concat+split does.
    *
    * One narrow projection + one per-shard window cumsum: a single
    * shuffle keyed by shard; shard count scales the parallelism and
    * bounds the per-task sort, so the 100 TB form is the same plan with
    * more shards. All-integer arithmetic — exact on both engines. */
  def packChunks(docs: DataFrame, contextLen: Int = 512,
                 shards: Int = 8): DataFrame =
    packTokenCounts(docs.select(col("doc_id"),
        graft.functions.TextExpressions.wsTokenCountFast(col("text"))
          .cast("long").as("n_tokens")),
      contextLen, shards)

  /** Packing core over a pre-tokenized `(doc_id, n_tokens)` frame — used
    * directly when token counts already exist (e.g. the curation
    * pipeline's output), so the text is not re-tokenized. */
  def packTokenCounts(counts: DataFrame, contextLen: Int,
                      shards: Int): DataFrame = {
    val sharded = counts.select(col("doc_id"),
      pmod(HashFunctions.hash60(col("doc_id")), lit(shards.toLong)).as("shard"),
      col("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    sharded
      .withColumn("cum_excl", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("cum_excl") / contextLen).cast("long").as("chunk_id"),
        (col("cum_excl") % contextLen).as("chunk_offset"))
  }

  /** x30 — the flagship end-to-end assembly: curation (lang + quality +
    * exact dedup, [[TextOps.trainingSelection]]) → deterministic train
    * split ([[hashBucket]] < 90) → sequence packing of the surviving
    * docs. One corpus scan for curation (one shuffle for its dedup), a
    * narrow split filter, one window pass for packing — the whole
    * pretraining data path as a single composed plan. */
  def trainingPipeline(docs: DataFrame, contextLen: Int = 512,
                       shards: Int = 8): DataFrame = {
    val selected = TextOps.trainingSelection(docs)
    val train = selected.filter(hashBucket(col("doc_id")) < 90)
    packTokenCounts(
      train.select(col("doc_id"), col("ws_tokens").cast("long").as("n_tokens")),
      contextLen, shards)
  }

  def trainingPipelineSql(contextLen: Int = 512, shards: Int = 8): String =
    s"""WITH sel AS (
       |${TextOps.trainingSelectionSql()}
       |), train AS (
       |  SELECT doc_id, CAST(ws_tokens AS BIGINT) AS n_tokens,
       |    ((${HashFunctions.hash60Sql("doc_id")}) % $shards + $shards) % $shards AS shard
       |  FROM sel
       |  WHERE ${hashBucketSql("doc_id")} < 90
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
       |  FROM train
       |)
       |SELECT doc_id, shard, n_tokens,
       |  CAST(cum_excl // $contextLen AS BIGINT) AS chunk_id,
       |  CAST(cum_excl % $contextLen AS BIGINT) AS chunk_offset
       |FROM c""".stripMargin

  def packChunksSql(contextLen: Int = 512, shards: Int = 8): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    ((${HashFunctions.hash60Sql("doc_id")}) % $shards + $shards) % $shards AS shard,
       |    CAST(len(${TextOps.wordsReSql("text")}) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
       |  FROM t
       |)
       |SELECT doc_id, shard, n_tokens,
       |  CAST(cum_excl // $contextLen AS BIGINT) AS chunk_id,
       |  CAST(cum_excl % $contextLen AS BIGINT) AS chunk_offset
       |FROM c""".stripMargin

  /** x83: cluster-aware train/val/test split — the leakage-free version
    * of [[trainValTest]]. Hashing doc_id sends near-duplicates of a
    * training document into the eval split (the x39 split-leakage
    * failure, now at assignment time instead of audit time); hashing
    * the near-dup CLUSTER id instead makes the whole duplicate class
    * atomic: every member lands in the same split by construction, and
    * the assignment is still a pure content-stable function — adding
    * unrelated rows never reassigns an existing cluster.
    *
    * Scale: the clustering is [[DedupOps.dupClusters]] (Borůvka over
    * the banded pair graph, log rounds); the split itself is one more
    * narrow projection over its label table. */
  def clusterSplit(docs: DataFrame, pairs: DataFrame, trainPct: Int = 90,
                   valPct: Int = 5, seed: Int = 0,
                   state: DedupOps.IterState = DedupOps.Local): DataFrame =
    clusterSplitOf(DedupOps.dupClusters(docs, pairs, state = state),
      trainPct, valPct, seed)

  /** [[clusterSplit]] over a precomputed label table — the gate path
    * feeds [[DedupOps.simhashClusters]] so the viral-clique pair mass
    * never expands into the clustering. */
  def clusterSplitOf(clusters: DataFrame, trainPct: Int = 90,
                     valPct: Int = 5, seed: Int = 0): DataFrame =
    trainValTest(clusters, col("cluster_id"), trainPct, valPct, seed)

  /** DuckDB twin of [[clusterSplit]] — the clustering twin wrapped in a
    * subquery, then the same bucket CASE over cluster_id. */
  def clusterSplitSql(clustersSql: String, trainPct: Int = 90,
                      valPct: Int = 5, seed: Int = 0): String =
    s"""SELECT doc_id, cluster_id,
       |  CASE WHEN ${hashBucketSql("cluster_id", seed)} < $trainPct THEN 'train'
       |       WHEN ${hashBucketSql("cluster_id", seed)} < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (
       |${clustersSql}
       |) cs""".stripMargin

  /** x82: weighted sampling without replacement by priority sampling
    * (Duffield, Lund & Thorup 2007): priority qᵢ = wᵢ / uᵢ with uᵢ a
    * per-key uniform, keep the k largest. Long documents are sampled
    * proportionally more — the length-aware corpus inspection sample a
    * token-budgeted pipeline wants (uniform x53 under-weights exactly
    * the docs that dominate the token bill), with Horvitz–Thompson
    * subset-sum estimates available from the kept priorities.
    *
    * Determinism without `ln`: the Efraimidis–Spirakis exponential-key
    * form needs ln(u)/w, whose last-ulp behavior differs across libm
    * implementations on arbitrary arguments. Priorities need ONE IEEE
    * division — correctly rounded on every engine, so both sides rank
    * identical doubles and the k-cut + (priority, doc_id) total order
    * are bit-stable. u = hash60(seed|doc_id) + 1 (the +1 keeps ANSI
    * division away from the 2⁻⁶⁰ zero-hash case).
    *
    * Scale: one narrow projection over the scan — weight is the native
    * byte-scan token count, no tokenize-and-explode — then a global
    * top-k, which Spark plans as TakeOrderedAndProject (per-partition
    * heaps, k rows to the driver stage; no full sort, no shuffle). */
  def prioritySample(df: DataFrame, k: Int = 100, seed: Int = 7): DataFrame =
    df.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextExpressions.wsTokenCountFast(col("text"))
          .cast("long").as("weight"),
        (HashFunctions.hash60(col("doc_id"), seed) + lit(1L)).as("u"))
      .filter(col("weight") > 0)
      .select(col("doc_id"), col("weight"), col("u"),
        (col("weight").cast("double") / col("u").cast("double")).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)

  /** x91: stratified priority sampling — [[prioritySample]]'s per-group
    * form and the exact batch semantics of `PriorityStream`: each
    * stratum (language, source, …) keeps its own k largest-priority
    * docs, so no group is starved by a heavier one. Plans as
    * WindowGroupLimit (per-partition rank heaps) — still no global
    * sort, and the only shuffle is the stratum partitioning. */
  def prioritySampleByStratum(df: DataFrame, k: Int = 20, seed: Int = 7,
                              stratum: Column = col("lang")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.filter(col("doc_id").isNotNull && stratum.isNotNull)
      .select(stratum.cast("string").as("stratum"), col("doc_id"),
        graft.functions.TextExpressions.wsTokenCountFast(col("text"))
          .cast("long").as("weight"),
        (HashFunctions.hash60(col("doc_id"), seed) + lit(1L)).as("u"))
      .filter(col("weight") > 0)
      .select(col("stratum"), col("doc_id"), col("weight"), col("u"),
        (col("weight").cast("double") / col("u").cast("double")).as("priority"))
      .withColumn("rank", row_number().over(
          Window.partitionBy("stratum")
            .orderBy(col("priority").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** DuckDB twin of [[prioritySampleByStratum]]. */
  def prioritySampleByStratumSql(k: Int = 20, seed: Int = 7,
                                 stratumExpr: String = "lang"): String =
    s"""SELECT stratum, doc_id, weight, u, priority, rank FROM (
       |  SELECT stratum, doc_id, weight, u,
       |    CAST(weight AS DOUBLE) / CAST(u AS DOUBLE) AS priority,
       |    CAST(row_number() OVER (PARTITION BY stratum
       |           ORDER BY CAST(weight AS DOUBLE) / CAST(u AS DOUBLE) DESC,
       |                    doc_id) AS BIGINT) AS rank
       |  FROM (
       |    SELECT CAST($stratumExpr AS VARCHAR) AS stratum, doc_id,
       |      CAST(len(${TextOps.wordsReSql("text")}) AS BIGINT) AS weight,
       |      (${HashFunctions.hash60Sql("doc_id", seed)}) + 1 AS u
       |    FROM documents
       |    WHERE doc_id IS NOT NULL AND $stratumExpr IS NOT NULL)
       |  WHERE weight > 0)
       |WHERE rank <= $k""".stripMargin

  /** DuckDB twin of [[prioritySample]] — same hash, same single IEEE
    * division, same (priority desc, doc_id) cut. */
  def prioritySampleSql(k: Int = 100, seed: Int = 7): String =
    s"""SELECT doc_id, weight, u,
       |  CAST(weight AS DOUBLE) / CAST(u AS DOUBLE) AS priority
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(${TextOps.wordsReSql("text")}) AS BIGINT) AS weight,
       |    (${HashFunctions.hash60Sql("doc_id", seed)}) + 1 AS u
       |  FROM documents WHERE doc_id IS NOT NULL)
       |WHERE weight > 0
       |ORDER BY priority DESC, doc_id
       |LIMIT $k""".stripMargin

  /** x144: balanced training-shard manifest — assign every document to
    * one of `shards` shards so the per-shard TOKEN MASS is near-equal
    * (the writer-side layout for training shards: equal wall-clock per
    * data-parallel reader), deterministically. [[packChunks]]'s hash
    * sharding equalizes DOC COUNTS; under a heavy-tailed length
    * distribution that leaves shards minutes apart in read time. Here
    * docs are ranked by (tokens DESC, doc_id) and dealt in SNAKE order
    * (block k of `shards` docs deals forward, block k+1 backward) — the
    * classic boustrophedon draft: each shard receives one doc per
    * block, alternating pick position, so long docs spread first and
    * every consecutive block-pair partially cancels its own skew.
    *
    * The global rank never sorts globally: [[TwoPhase.prefixed]] over
    * equi-width token-count buckets (bounds off the 1-row stats scan
    * that also rides the broadcast) — per-bucket sorts only, rank =
    * broadcast prefix offset + within-bucket row_number; the empty
    * partCols case is exactly the x126/x137 discipline with ONE logical
    * partition. Output is `shards` rows: doc/token mass and exact
    * integer share_ppm (DECIMAL numerators per the x133 overflow
    * convention). */
  /** Per-document snake assignment — every `docs` column passes
    * through, plus `__n` (token count) and `shard`. Shared by the x144
    * manifest and [[writeShards]]. */
  private def snakeAssign(docs: DataFrame, shards: Int,
                          buckets: Int): DataFrame = {
    require(shards >= 1 && shards <= 4096, s"shards=$shards")
    val toks = docs.withColumn("__n",
      coalesce(graft.functions.TextExpressions.wsTokenCountFast(col("text"))
        .cast("long"), lit(0L)))
    val st = toks.agg(min(col("__n")).as("__t0"), max(col("__n")).as("__t1"))
    TwoPhase.prefixed(
      toks.crossJoin(broadcast(st)),
      partCols = Seq.empty,
      bucketCol = TwoPhase.equiWidthBucketSql("(__t1 - __n)", "0",
        "(__t1 - __t0)", buckets),
      orderCols = Seq(col("__n").desc, col("doc_id")),
      sums = Seq("rn" -> lit(1L)), totals = false)
      .withColumn("shard",
        expr(s"CASE WHEN ((rn_pre - 1L) div ${shards}L) % 2L = 0L " +
          s"THEN (rn_pre - 1L) % ${shards}L " +
          s"ELSE ${(shards - 1).toLong}L - (rn_pre - 1L) % ${shards}L END"))
      .drop("__t0", "__t1", "rn_pre")
  }

  def shardManifest(docs: DataFrame, shards: Int = 8,
                    buckets: Int = 64): DataFrame =
    snakeAssign(docs.select(col("doc_id"), col("text")), shards, buckets)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) " +
          "div (sum(n_tokens) OVER ()) AS BIGINT)").as("share_ppm"))

  /** The write path the x144 manifest describes: rewrite the corpus as
    * `shards` near-equal-token-mass parquet partitions
    * (`shard=K/`, exactly one file each). The shuffle keys on the
    * shard id, so a data-parallel reader maps one directory to one
    * worker and every worker finishes together — the property the
    * manifest PROMISES and this writer delivers (SamplingOpsSpec reads
    * the files back and checks the physical masses against the
    * manifest). A hash collision between shard ids only co-locates two
    * shards in one task; `partitionBy` still splits their directories,
    * and each directory is written by exactly one task → one file.
    *
    * Exactly-once commit: the layout lands in `root/.staging` first,
    * then publishes as a version under `root` via
    * [[graft.core.AtomicDir]] (atomic rename + `CURRENT` pointer
    * rewrite) — a crash at ANY point, including between shard
    * directories, leaves the previously-published layout fully
    * readable at [[currentShards]] and at worst an orphaned staging
    * dir the next run's overwrite reclaims. Returns the published
    * version path. */
  def writeShards(docs: DataFrame, root: String, shards: Int = 8,
                  buckets: Int = 64): String = {
    val staging = s"$root/.staging"
    snakeAssign(docs, shards, buckets)
      .drop("__n")
      .repartition(shards, col("shard"))
      .write.partitionBy("shard").mode("overwrite").parquet(staging)
    graft.core.AtomicDir.promote(root, staging)
  }

  /** The live shard layout under `root` — what readers open. */
  def currentShards(root: String): String = graft.core.AtomicDir.current(root)

  /** DuckDB twin of [[shardManifest]] — the rank-window definition the
    * TwoPhase form must equal. */
  def shardManifestSql(shards: Int = 8): String =
    s"""WITH sm_t AS (
       |  SELECT doc_id,
       |    coalesce(CAST(len(${TextOps.wordsReSql("text")}) AS BIGINT), 0) AS n
       |  FROM documents
       |), sm_r AS (
       |  SELECT n, row_number() OVER (ORDER BY n DESC, doc_id) - 1 AS rk
       |  FROM sm_t
       |), sm_s AS (
       |  SELECT CASE WHEN (rk // $shards) % 2 = 0 THEN rk % $shards
       |              ELSE ${shards - 1} - (rk % $shards) END AS shard, n
       |  FROM sm_r
       |), sm_g AS (
       |  SELECT shard, count(*) AS n_docs, sum(n) AS n_tokens FROM sm_s
       |  GROUP BY shard
       |)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST((CAST(n_tokens AS HUGEINT) * 1000000)
       |    // (SELECT sum(n_tokens) FROM sm_g) AS BIGINT) AS share_ppm
       |FROM sm_g""".stripMargin

  def splitReportSql: String =
    s"""WITH s AS (
       |  SELECT lang,
       |    CASE WHEN ${hashBucketSql("doc_id")} < 90 THEN 'train'
       |         WHEN ${hashBucketSql("doc_id")} < 95 THEN 'val'
       |         ELSE 'test' END AS split,
       |    ${TextOps.qualityScoreColSql("text")} AS quality
       |  FROM documents
       |)
       |SELECT lang, split, count(*) AS n_docs,
       |  CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_quality
       |FROM s GROUP BY lang, split""".stripMargin
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the BASELINE.md performance gates: these
  * pin the PLAN SHAPE, not timings — the properties that survive a 100×
  * scale-up. If a refactor regresses one of these, the bench will follow.
  *
  *   - duplicate search: union-of-equi-joins, never a nested-loop join;
  *   - top-K scheduling: TakeOrderedAndProject, never a global Sort+Limit;
  *   - view joins: directory/needle sides broadcast (no big-side shuffle);
  *   - scans: filter pushdown + column pruning reach the parquet reader.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("duplicate-file search plans as broadcast hash joins, no BNLJ") {
    val c = SparkEntry.cat(spark, sfDir)
    val needle = c.vwLl.filter(col("file_id").isin(100L, 102L))
    val plan = physicalPlan(
      graft.operators.SearchOps.duplicatesOf(c.vwLl, needle,
        hashMatch = true, nameMatch = false))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"OR-join decomposition must avoid BNLJ:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "needle side should broadcast")
  }

  test("T1 scheduling compiles to TakeOrderedAndProject (no global sort)") {
    val c = SparkEntry.cat(spark, sfDir)
    val plan = physicalPlan(graft.operators.ScheduleOps.dirsToCrawl(
      c.directoryControl, lit(java.sql.Timestamp.valueOf("2024-02-11 16:00:00")), 20))
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-K operator:\n$plan")
  }

  test("schedule view (t6) compiles to TakeOrderedAndProject") {
    val c = SparkEntry.cat(spark, sfDir)
    val plan = physicalPlan(graft.operators.ScheduleOps.viewScrapeSchedule(
      c.directoryControl, "/A*", recursive = true,
      orderBy = Seq(("file_count", false)), rowLimit = 25))
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-K operator:\n$plan")
  }

  test("x158/x160 consume the contracted pair form — no clique expansion in-plan") {
    // the mass consumers must aggregate rep pairs + closed-form clique
    // terms: neither expandRepPairs' member fan-out (least(da, db)
    // orientation projections) nor intraCliquePairs' member self-join
    // (a doc_id < doc_id join condition — the rep-level band self-join
    // is invisible here behind its localCheckpoint pin) may appear
    val memberLt = "doc_id#\\d+L? < doc_id#\\d+".r
    for (q <- Seq("x158_dedup_yield", "x160_policy_delta")) {
      val plan = physicalPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("least(da#"),
        s"$q: expandRepPairs member expansion leaked into the plan")
      assert(memberLt.findFirstIn(plan).isEmpty,
        s"$q: member-level self-join (intraCliquePairs) leaked into the plan")
    }
    // the pair RELATION operator keeps the expansion — it IS the output
    val x10 = physicalPlan(SparkEntry.queries("x10_simhash_pairs")(spark, sfDir))
    assert(x10.contains("least(da#"),
      "x10's contract is the expanded pair relation (expandRepPairs)")
  }

  test("x184 hot-bucket report broadcasts the key-space-bounded hot set") {
    // the hot set is <= 4*2^15 rows whatever the corpus, so attaching
    // it to the 4-rows-per-rep block relation must be a broadcast hash
    // join, never a shuffled join of the block relation
    val plan = physicalPlan(
      SparkEntry.queries("x184_hot_buckets")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      s"hot set should broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"x184:\n$plan")
  }

  test("x186 virality reads the index alone — the corpus text is never scanned") {
    // the ledger's whole point: corpus-wide copy counts WITHOUT touching
    // the 100 TB corpus — the plan may scan only index parquet
    // (cliques/rejections); any documents.parquet scan is a regression
    // to the direct recount the oracle runs
    val plan = physicalPlan(
      SparkEntry.queries("x186_index_virality")(spark, sfDir))
    assert(!plan.contains("documents.parquet"),
      s"x186 must not rescan the corpus:\n$plan")
    // (the rejections scan is present too, but long multi-path
    // InMemoryFileIndex lists truncate in the plan string)
    assert(plan.contains("cliques"),
      s"x186 reads the contracted index tables:\n$plan")
  }

  test("x187 guarded admission attaches the hot set by broadcast") {
    // the hot-bucket set is key-space-bounded (<= 4 bands x bucket
    // keys above the cap) — excluding it from the probe and counting
    // each rep's hot postings must both broadcast it, never shuffle
    // the posting relation
    val plan = physicalPlan(
      SparkEntry.queries("x187_guarded_admission")(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"x187:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"hot set should broadcast:\n$plan")
  }

  test("training selection (x19) is one scan + one shuffle with partial aggregation") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.trainingSelection(docs))
    assert(plan.split("Exchange").length - 1 <= 1, s"expected a single shuffle:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"),
      s"expected map-side partial aggregation:\n$plan")
    assert(!plan.contains("Join"), s"feature columns must not self-join:\n$plan")
  }

  test("langId family tokenizes ONCE per row (x2/x19/x30 two-phase scoring)") {
    // the round-6 plan inlined split(trim(text)) 38× into one Project via
    // the nested lang CASE; the two-phase rewrite (scores behind a
    // CollapseProject boundary, CASE over attributes) must keep exactly
    // one tokenization in the whole plan — for the scoring projection AND
    // for any filter copy pushdown might try to create
    val docs = graft.core.Tables.documents(spark, sfDir)
    def splits(df: DataFrame): Int =
      "split\\(trim\\(".r.findAllIn(physicalPlan(df)).length
    assert(splits(graft.operators.TextOps.langId(docs)) === 1, "x2 langId")
    assert(splits(graft.operators.TextOps.trainingSelection(docs)) === 1, "x19")
    assert(splits(graft.operators.SamplingOps.trainingPipeline(docs)) === 1, "x30")
  }

  test("x19 filters below the Exchange, on materialized score attributes") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.trainingSelection(docs))
    // the CollectMetrics barrier is what keeps predicate pushdown from
    // rewriting the cheap attribute filter into a 21×-inlined scan
    // predicate — if it disappears, so does the single-split property
    assert(plan.contains("CollectMetrics"), s"pushdown barrier must survive:\n$plan")
    val exch = plan.indexOf("Exchange")
    val filt = plan.indexOf("= en)")
    assert(exch >= 0 && filt > exch,
      s"language/quality filter must run map-side, below the shuffle:\n$plan")
  }

  test("x67 lmScore tokenizes the corpus ONCE; broadcast cost join, no nested loops") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.lmScore(docs))
    assert(plan.contains("BroadcastHashJoin"),
      s"token→cost join must broadcast the vocab table:\n$plan")
    // the 1-row T+V cross join plans as BNLJ-Cross by design (the
    // accepted x69 stats-relation shape) — forbid only big-side forms
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no big-side join in the cost lookup:\n$plan")
    // the (doc_id, token) matrix shuffle feeds both the vocab statistics
    // and the scoring join; AQE's stage cache resolves the two canonically
    // identical exchanges to ONE executed stage — visible only in the
    // final (post-execution) adaptive plan, so run the query first
    val df = graft.operators.TextOps.lmScore(docs)
    df.collect()
    // AdaptiveSparkPlan.toString appends the initial plan — slice it off
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(finalPlan.split("Generate").length - 1 === 1,
      s"corpus must be tokenized exactly once:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"both consumers must share the occurrence-matrix stage:\n$finalPlan")
  }

  test("x68/x70/x71: occurrence-matrix reuse holds for the other scorers too") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    for ((name, df) <- Seq(
      "x68" -> graft.operators.TextOps.bigramLmScore(docs),
      "x70" -> graft.operators.TextOps.sourceKl(docs),
      // composed: the band filter + dedup join must not break the
      // scorer's internal stage reuse
      "x71" -> graft.operators.TextOps.perplexityBand(docs, 3.39, 3.42))) {
      df.collect()
      val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
      assert(finalPlan.split("Generate").length - 1 === 1,
        s"$name: corpus must be tokenized exactly once:\n$finalPlan")
      assert(finalPlan.contains("ReusedExchange"),
        s"$name: consumers must share the matrix stage:\n$finalPlan")
    }
  }

  test("x75 NB classifier: one tokenization, matrix/langTok stages reused, rank-1 pushdown") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.ClassifyOps.nbLangScore(docs)
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(finalPlan.split("Generate").length - 1 === 1,
      s"corpus must be tokenized exactly once (the vocab branch collapses " +
        s"to a second scan if RemoveRedundantAggregates gets past the clt " +
        s"filter):\n$finalPlan")
    assert(finalPlan.split("ReusedExchange").length - 1 >= 3,
      s"matrix + langTok (x2) stages must be shared:\n$finalPlan")
    assert(finalPlan.contains("WindowGroupLimit"),
      s"the class argmin must plan as a rank-limit pushdown:\n$finalPlan")
  }

  test("x74 PMI: both unigram sides share one scan; top-K is TakeOrderedAndProject") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.TextOps.pmiCollocations(docs, 5, 50)
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    // one unigram + one bigram tokenization — ua/ub must NOT add a third
    assert(finalPlan.split("Generate").length - 1 === 2,
      s"exactly one unigram and one bigram pass:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"ua and ub must share the unigram stage:\n$finalPlan")
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"the top-K cut must not global-sort:\n$finalPlan")
  }

  test("x80 TF-IDF: one tokenization, matrix reused by df/N branches, rank-k pushdown") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.TextOps.tfidfKeywords(docs, 5)
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(finalPlan.split("Generate").length - 1 === 1,
      s"corpus must be tokenized exactly once (doc-count branch collapses " +
        s"to a second scan if RemoveRedundantAggregates gets past the " +
        s"tf >= 1 filter):\n$finalPlan")
    assert(finalPlan.split("ReusedExchange").length - 1 >= 2,
      s"df + doc-count + scoring consumers must share the matrix stage:\n$finalPlan")
    assert(finalPlan.contains("WindowGroupLimit"),
      s"the per-doc top-k must plan as a rank-limit pushdown:\n$finalPlan")
    // the 1-row doc-count cross join plans as BNLJ-Cross by design (the
    // accepted x69 stats-relation shape) — forbid only the big-side forms
    assert(!finalPlan.contains("SortMergeJoin") &&
      !finalPlan.contains("CartesianProduct"),
      s"idf lookup must broadcast:\n$finalPlan")
  }

  test("x81 keyness: one tokenization, margins share the matrix stage, rank-k pushdown") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.TextOps.sourceKeyness(docs, 5, 10)
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(finalPlan.split("Generate").length - 1 === 1,
      s"corpus must be tokenized exactly once:\n$finalPlan")
    assert(finalPlan.split("ReusedExchange").length - 1 >= 2,
      s"token/source margin branches must share the matrix stage:\n$finalPlan")
    assert(finalPlan.contains("WindowGroupLimit"),
      s"the per-source top-k must plan as a rank-limit pushdown:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin") &&
      !finalPlan.contains("CartesianProduct"),
      s"margin lookups must broadcast:\n$finalPlan")
  }

  test("x84/x85: corpus-diagnostic operators tokenize once and reuse the matrix stage") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    for ((name, df) <- Seq(
      "x84" -> graft.operators.TextOps.vocabGrowth(docs, 10),
      "x85" -> graft.operators.TextOps.hapaxReport(docs))) {
      df.collect()
      val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
      assert(finalPlan.split("Generate").length - 1 === 1,
        s"$name: corpus must be tokenized exactly once:\n$finalPlan")
      assert(finalPlan.contains("ReusedExchange"),
        s"$name: derived branches must share the matrix stage:\n$finalPlan")
    }
  }

  test("x87 source dup rate: combinable aggregate + join-back, no content-hash window") {
    // the round-11 verdict OVERRULED the old single-scan window pin:
    // `count over Window.partitionBy(content_hash)` buffers a viral dup
    // cluster in ONE task with no AQE mitigation. The intended shape is
    // groupBy(content_hash).count (map-side partials collapse the
    // cluster) joined back — the second scan of the narrow projection is
    // the accepted price, the join is AQE-skew-splittable.
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.DedupOps.sourceDupRate(docs)
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("windowspecdefinition"),
      s"group sizes must NOT ride a content-key window:\n$finalPlan")
    assert(finalPlan.contains("Join"),
      s"counts must join back onto the keyed projection:\n$finalPlan")
    assert(finalPlan.split("Scan parquet").length - 1 <= 2,
      s"at most the two narrow-projection scans:\n$finalPlan")
  }

  test("x88 source JS: one tokenization, both self-join sides + totals reuse the matrix") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.TextOps.sourceJsMatrix(docs)
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(finalPlan.split("Generate").length - 1 === 1,
      s"corpus must be tokenized exactly once:\n$finalPlan")
    assert(finalPlan.split("ReusedExchange").length - 1 >= 3,
      s"totals + both self-join sides must share the matrix stage:\n$finalPlan")
  }

  test("vw_ll plans with broadcast dimension joins") {
    val c = SparkEntry.cat(spark, sfDir)
    val plan = physicalPlan(c.vwLl)
    assert(plan.contains("BroadcastHashJoin"), "directory side should broadcast")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"no BNLJ in the view:\n$plan")
  }

  test("filter + projection push down to the parquet scan") {
    val plan = physicalPlan(
      graft.core.Tables.lineitem(spark, sfDir)
        .filter(col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"),
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must prune to the 2 projected columns:\n$plan")
  }

  test("whole-stage codegen covers the scalar path functions") {
    val c = SparkEntry.cat(spark, sfDir)
    val df = c.directory.select(
      graft.functions.PathFunctions.basepath(col("dir_path")),
      graft.functions.PathFunctions.basename(col("dir_path")))
    df.collect() // finalize the adaptive plan
    val plan = physicalPlan(df)
    // WholeStageCodegen spans print as "*(id)" in the final plan
    assert(plan.contains("*("),
      s"path functions must stay inside codegen:\n$plan")
  }

  test("exact dedup aggregates partially before the shuffle") {
    val plan = physicalPlan(graft.operators.DedupOps.exactDupGroups(
      graft.core.Tables.documents(spark, sfDir)))
    // partial_ aggregate before exchange = map-side combine
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"expected partial aggregation:\n$plan")
  }

  test("as-of join (j15) is join-free: one shuffle, one window pass") {
    val plan = physicalPlan(graft.operators.TemporalJoins.purchaseClickAsOf(
      graft.core.Tables.events(spark, sfDir)))
    // the union+window formulation contains NO join operator at all — the
    // property that makes it survive dense keys at scale
    assert(!plan.contains("Join"), s"as-of join must not plan a join:\n$plan")
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges <= 2, s"expected a single shuffle (+AQE read):\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }

  test("band join (j16) is an equi-join on buckets, never a cross product") {
    val plan = physicalPlan(graft.operators.TemporalJoins.valueBandPairs(
      graft.core.Tables.events(spark, sfDir)))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"band join must stay an equi-join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"expected partial aggregation after the band filter:\n$plan")
  }

  test("decontamination (x28) broadcasts the eval side, corpus not shuffled before the join") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.DedupOps.contaminationReport(
      docs, col("doc_id") % 50 === 0, n = 3))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the corpus side must not shuffle into the join:\n$plan")
    assert(plan.contains("partial_count"),
      s"pair counting must aggregate map-side first:\n$plan")
  }

  test("adc ANN (x24) probes via broadcast hash join, never a BNLJ") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val model = graft.operators.IvfOps.train(emb, k = 4, iterations = 1)
    val plan = physicalPlan(graft.operators.IvfOps.adcTopK(
      emb, emb.filter(col("vec_id") % 100 === 0), model, k = 4, nProbe = 2))
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join must broadcast the query side:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"adc must never plan a BNLJ:\n$plan")
  }

  test("interval join (j17) is a bucket equi-join, never a cross/nested-loop product") {
    val events = graft.core.Tables.events(spark, sfDir)
    val plan = physicalPlan(
      graft.operators.TemporalJoins.concurrentSessions(events))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval overlap must ride the bucket equi-join:\n$plan")
  }

  test("length quantiles (x32) and repetition (x34) stay narrow before their shuffles") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val qPlan = physicalPlan(graft.operators.TextOps.lengthQuantiles(docs))
    assert(!qPlan.contains("Join"), s"quantiles must not join:\n$qPlan")
    val rPlan = physicalPlan(graft.operators.TextOps.repetitionReport(docs))
    assert(!rPlan.contains("Exchange") && !rPlan.contains("Join"),
      s"repetition ratios are a pure narrow projection:\n$rPlan")
  }

  test("sliding chunks (x41) is a pure narrow projection — no shuffle, no join") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.slidingChunks(docs))
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"the chunker must run map-side at scan speed:\n$plan")
  }

  test("bigram top-K (x43) plans as TakeOrderedAndProject over a partial agg") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.bigramTop(docs))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must never be a global sort:\n$plan")
    assert(plan.contains("partial_count"),
      s"bigram counting must aggregate map-side first:\n$plan")
  }

  test("length gate (x44) broadcasts the quantile band table") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.lengthGate(docs))
    assert(plan.contains("BroadcastHashJoin"),
      s"the one-row-per-language band table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the gate join:\n$plan")
  }

  test("bloom decontamination (x40) keeps the exact form's broadcast join shape") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.DedupOps.bloomContaminationReport(
      docs, col("doc_id") % 40 === 1, n = 4, minShared = 2))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin"),
      s"the corpus side must not shuffle into the join:\n$plan")
  }

  test("q4 EXISTS plans as a LEFT SEMI join (one probe row per order, no dedup)") {
    val plan = physicalPlan(SparkEntry.queries("q4_priority_exists")(spark, sfDir))
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as semi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$plan")
    assert(!plan.toLowerCase.contains("distinct"),
      s"semi join needs no post-join dedup:\n$plan")
  }

  test("q6 pushes every predicate and prunes to the referenced columns at the scan") {
    val df = SparkEntry.queries("q6_revenue_pushdown")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan parquet")).mkString("\n")
    val full = df.queryExecution.executedPlan.toString
    // shipdate bounds, discount band, and quantity cap reach the reader
    assert(full.contains("PushedFilters:") &&
      Seq("l_shipdate", "l_discount", "l_quantity")
        .forall(c => full.split("PushedFilters:")(1).split("\n")(0).contains(c)),
      s"every predicate must push down:\n$full")
    // the read schema carries only the five referenced columns
    val readSchema = full.split("ReadSchema:")(1).split("\n")(0)
    assert(Seq("l_extendedprice", "l_discount", "l_shipdate", "l_quantity")
      .forall(readSchema.contains) && !readSchema.contains("l_orderkey"),
      s"column pruning must drop unreferenced columns:\n$readSchema")
    assert(scan.nonEmpty)
  }

  test("gopher gates (x98) tokenize ONCE per row behind phased projections") {
    // the first-cut plan inlined ws_tokens into every rule — 9 copies per
    // row; the phased rewrite (array + counters materialized, gates over
    // attributes) must keep exactly one tokenization and no shuffle
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.CurationOps.gopherGates(docs))
    assert("ws_tokens\\(".r.findAllIn(plan).length === 1,
      s"expected one tokenization:\n$plan")
    assert(!plan.contains("Exchange"), s"pure projection, no shuffle:\n$plan")
  }

  test("protoPrune (x100) is one centroid shuffle; both windows share it") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val model = graft.operators.IvfOps.train(emb, k = 8, iterations = 1)
    val plan = physicalPlan(graft.operators.IvfOps.protoPrune(emb, model))
    assert(plan.split("Exchange hash").length - 1 === 1,
      s"expected exactly one hash exchange (centroid_id):\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).length >= 2,
      s"rank and size windows expected:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"centroids must broadcast:\n$plan")
  }

  test("q17 correlated-average: the filtered fact exchange is shared by aggregate and probe") {
    import graft.core.Tables
    val p = Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#1")
      .select("p_partkey")
    val pl = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val ag = pl.groupBy("l_partkey")
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
    val df = pl.join(ag, Seq("l_partkey"))
      .filter(lit(2L) * col("q") * col("cnt") < col("sq"))
      .agg(count(lit(1)).as("n_lines"))
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"),
      s"the per-part aggregate must be served from the probe's exchange " +
        s"(fact scanned once at runtime):\n$finalPlan")
    assert(!finalPlan.contains("BroadcastNestedLoopJoin"))
  }

  test("two-level assignment (x115) is a pure stateless map: zero exchanges") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val model = graft.operators.IvfOps.trainTwoLevel(
      graft.operators.IvfOps.train(emb, k = 16, iterations = 1))
    val plan = physicalPlan(graft.operators.IvfOps.assignTwoLevel(emb, model))
    assert(!plan.contains("Exchange"),
      s"hierarchical assignment must not shuffle the corpus:\n$plan")
  }

  test("BPE applyCounts (x112): one tokenization, lexicon served from the matrix exchange") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val model = graft.operators.BpeOps.train(docs, rounds = 8)
    val df = graft.operators.BpeOps.applyCounts(docs, model)
    df.collect()
    val finalPlan = physicalPlan(df).split("== Initial Plan ==")(0)
    assert(finalPlan.split("Generate").length - 1 === 1,
      s"corpus must be tokenized exactly once (the lexicon derivation " +
        s"collapses to a second scan if RemoveRedundantAggregates gets " +
        s"past the ct/wdf filters):\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"the lexicon branch must reuse the occurrence-matrix exchange:\n$finalPlan")
  }

  test("funnel (x56): every shuffle keys on user_id, no nested-loop/cartesian join") {
    // round-8 lesson: x56/x57 swung 3-5x on a data regeneration and each
    // cost a judge plan-audit to clear — pin the shape so only a REAL
    // regression can move it. Funnel contract: stage gating is per-user
    // conditional mins, so user_id is the only legitimate shuffle key;
    // a sequence-window rewrite or a join on anything else breaks here.
    val ev = graft.core.Tables.events(spark, sfDir)
    val plan = physicalPlan(graft.operators.TemporalJoins.orderedFunnel(
      ev, Seq("view", "click", "purchase"), "1 DAY"))
    val keys = "hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(_ == "user_id"),
      s"every hash exchange must key on user_id, got $keys:\n$plan")
    assert(keys.length <= 5, // 2*stages - 1: per-stage gate aggs, s0 reused
      s"extra Exchange crept in (${keys.length} > 5):\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$plan")
  }

  test("retention (x57): exactly three shuffles (first-seen, distinct, matrix), 2-column scans") {
    import graft.core.Tables
    val ev = Tables.events(spark, sfDir).select(col("user_id"),
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"))
    val first = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
    val ret = ev.join(first, Seq("user_id"))
      .select(col("user_id"),
        floor(col("first_day") / 7).cast("long").as("cohort_week"),
        floor((col("day") - col("first_day")) / 7).cast("long").as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val plan = physicalPlan(ret)
    val keys = "hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(keys.sorted == Seq("cohort_week", "user_id", "user_id"),
      s"expected first-seen agg + distinct on user_id + matrix agg, got $keys:\n$plan")
    // the scan must prune to (ts, user_id) — an event_type/value column
    // reaching the reader means a projection regression
    val scans = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(scans.nonEmpty && scans.forall(_.split(",").length <= 2),
      s"retention scans must read only (ts, user_id):\n$scans")
  }

  test("hybridRrf (x101) cuts both lists with TakeOrderedAndProject, no global Sort") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val plan = physicalPlan(
      graft.operators.RetrievalOps.hybridRrf(docs, emb))
    assert("TakeOrderedAndProject".r.findAllIn(plan).length >= 3,
      s"both list cuts + the fusion cut must be top-K operators:\n$plan")
    // Sorts DO appear below — the rank windows and the full-outer fusion
    // join sort their 50-row post-cut inputs, which is fine; the pin that
    // matters is above: every corpus-sized ordering is a top-K heap
    // (three TakeOrderedAndProject nodes), so no Sort sees the corpus.
  }

  test("q20 dominant suppliers: per-part total is a WINDOW over the aggregate, never a join-back") {
    val plan = physicalPlan(
      SparkEntry.queries("q20_dominant_suppliers")(spark, sfDir))
    // pair aggregate + partkey window + suppkey aggregate — and nothing
    // else: a join-back of per-part totals would add a 4th exchange that
    // can never reuse the aggregate's (partial aggs differ below them)
    assert(plan.split("Exchange hash").length - 1 === 3,
      s"expected exactly 3 hash exchanges (pair agg, window, supp agg):\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).length === 1,
      s"one window computes the per-part total:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"part/supplier/nation dimensions must broadcast:\n$plan")
  }

  test("q21 waiting suppliers: both per-order counts share ONE window; top-10 is a heap") {
    val plan = physicalPlan(
      SparkEntry.queries("q21_waiting_suppliers")(spark, sfDir))
    // n_supps and n_late partition on the same key, so Catalyst must fuse
    // them into a single Window node riding the one orderkey shuffle
    assert("\\bWindow\\b".r.findAllIn(plan).length === 1,
      s"supplier-count and late-count windows must fuse into one:\n$plan")
    assert(plan.split("Exchange hash").length - 1 === 3,
      s"expected exactly 3 hash exchanges (pair agg, window, numwait agg):\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must be per-partition heaps, not a global Sort+Limit:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the quadruple-self-join rewrite must stay join-light:\n$plan")
  }

  test("sample-quantile calibration (x129): corpus compresses to (lang,n) counts BELOW every window") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(
      graft.operators.TextOps.sampleQuantileCalibration(docs))
    // scale truth: the corpus is scanned and tokenized ONCE into the
    // per-(lang, token-count) count relation — the (lang, n)-keyed
    // exchange below every window proves each window partitions the
    // aggregate (bounded by langs × longest doc), never the raw corpus
    // on `lang` alone
    assert(plan.split("FileScan").length - 1 === 1,
      s"expected exactly 1 scan (one pass, one tokenization):\n$plan")
    assert("Exchange hashpartitioning\\(lang#\\d+, n#".r.pattern.matcher(plan).find(),
      s"windows must sit above the (lang, n) count aggregate:\n$plan")
    assert(!plan.contains("Join"),
      s"count-compression needs no join at all:\n$plan")
  }

  // a windowspecdefinition partitioned on the named low-cardinality key
  // WITHOUT the two-phase __bk bucket following it — the single-task
  // sort shape the x126/x137 rewrites eliminated
  private def keyOnlyWindow(key: String) =
    s"windowspecdefinition\\($key#\\d+, (?!__bk#)".r

  test("disorder profile (x137): no type-only window over the raw events; prefix maxes broadcast back") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val plan = physicalPlan(graft.streaming.EventStreams.disorderProfile(ev))
    assert(!keyOnlyWindow("event_type").pattern.matcher(plan).find(),
      s"found a window partitioned on event_type without the __bk bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket prefix maxes must broadcast onto the events:\n$plan")
    assertOnlyBroadcastJoins(plan)
    assert(plan.split("FileScan").length - 1 <= 4,
      s"expected ≤4 column-pruned scans (id-range stats ×2 branches, bucket maxes, main):\n$plan")
  }

  /** The two-phase shape may join only by broadcast: the offset/stats
    * relations come back as BroadcastHashJoin or as the 1-row
    * `crossJoin(broadcast(stats))` BNLJ — never a fact-side shuffle
    * join or a non-degenerate nested loop. */
  private def assertOnlyBroadcastJoins(plan: String): Unit = {
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"no fact-side shuffle join anywhere in the two-phase shape:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin [A-Za-z]+, Cross".r
      .findAllIn(plan).length
    val all = plan.split("BroadcastNestedLoopJoin").length - 1
    assert(all === bnlj,
      s"every BNLJ must be the 1-row broadcast stats cross join:\n$plan")
  }

  test("shard manifest (x144): two-phase global rank — broadcast-only joins, bounded scans") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.SamplingOps.shardManifest(docs))
    assertOnlyBroadcastJoins(plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"rank offsets must broadcast onto the corpus:\n$plan")
    // token-range stats, bucket-aggregate branch, main branch
    assert(plan.split("FileScan").length - 1 <= 4,
      s"expected ≤4 column-pruned scans:\n$plan")
    assert(!plan.contains("ntile"),
      s"snake ids are closed-form over two-phase ranks, not ntile:\n$plan")
  }

  test("novelty (x146): no window anywhere; first-occurrence is an aggregate, 2 scans") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.DedupOps.noveltyScore(docs))
    assert(!plan.contains("Window"),
      s"a gram-partitioned window would single-task viral grams:\n$plan")
    assert(plan.split("FileScan").length - 1 === 2,
      s"row-local gram counts + the gram matrix — exactly 2 scans:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"equi-joins only:\n$plan")
  }

  test("quality percentile (x148): windows only above the grid aggregate; 2 scans") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val df = graft.operators.TextOps.qualityPercentile(docs)
    val plan = physicalPlan(df)
    assert(plan.split("FileScan").length - 1 === 2,
      s"fact + grid-aggregate branch — exactly 2 scans:\n$plan")
    // every Window in this plan must sit above the (source, q_micro)
    // HashAggregate: the plan lists operators top-down, so the LAST
    // Window line must appear before the last partial HashAggregate of
    // the grid branch — cheap structural proxy: no window may consume
    // the raw scan directly (a Project/Filter chain from FileScan to
    // Window without an Aggregate in between)
    val segs = plan.split("Window")
    assert(segs.length >= 2, s"grid windows expected:\n$plan")
    assert(segs.tail.forall(_.nonEmpty), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the join back onto the fact keys on the grid (source, q_micro)
    assert(plan.contains("q_micro"), plan)
  }

  test("quantile normalization (x153): unpartitioned windows only over bucket aggregates") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.quantileNormalize(docs))
    // unpartitioned = the FIRST windowspecdefinition argument is an
    // order column (carries ASC/DESC). The only ones allowed are
    // TwoPhase's offset windows over the ≤B-row bucket aggregate —
    // they order solely by __bk. The round-10 cut ran the union
    // carry-forward through a global Window over the |sources|·grid
    // union; this pin keeps that single-task sort dead.
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    val unpart = specs.filter { s =>
      val first = s.split(",")(0)
      first.contains(" ASC") || first.contains(" DESC")
    }
    assert(unpart.nonEmpty, s"TwoPhase offset windows expected:\n$plan")
    unpart.foreach(s => assert(s.split(",")(0).contains("__bk"),
      s"unpartitioned window NOT over the bucket aggregate: $s\n$plan"))
    // grid aggregate pinned → the static plan scans the corpus once
    // (the pin's own materialization is the second, bounded, scan)
    assert(plan.split("FileScan").length - 1 === 1,
      s"grid must come from the pinned aggregate, not re-scans:\n$plan")
  }

  test("lang mix (x149): one scan, one Generate, no joins — the pivot did its job") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.TextOps.langMixProfile(docs))
    assert(plan.split("FileScan").length - 1 === 1,
      s"one corpus pass:\n$plan")
    assert(plan.split("Generate").length - 1 === 1,
      s"one window explode:\n$plan")
    assert(!plan.contains("Join"),
      s"the language axis pivots into fixed sums — no (doc,lang) join:\n$plan")
  }

  test("CMS join-size estimation (x122): the counter tables meet in a broadcast join") {
    val o = graft.core.Tables.orders(spark, sfDir)
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val plan = physicalPlan(graft.operators.SketchOps.joinSizeCalibration(
      o, col("o_orderkey"), li, col("l_orderkey")))
    // the d·w counter table is sketch-sized by construction — shuffling
    // it would forfeit the sketch's point: estimate without a fact shuffle
    assert(plan.contains("BroadcastHashJoin"),
      s"counter-table meet must broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") ||
      plan.split("CartesianProduct").length - 1 <= 3,
      s"only 1-row stat relations may cross-join:\n$plan")
  }

  test("self-retrieval eval (x131): query terms broadcast onto the postings — the matrix never re-shuffles for the probe") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val plan = physicalPlan(graft.operators.RetrievalOps.selfRetrievalEval(
      docs, col("doc_id") % 20 === 0, nTerms = 4))
    // the probe join must be a BroadcastHashJoin (query fleet is tiny by
    // construction); a SortMergeJoin here means the posting relation
    // shuffles once per query batch — the shape that dies at 100 TB
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term probe must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"postings must never shuffle for the probe:\n$plan")
  }

  test("session transitions (x135): margins are windows over the matrix, never join-backs") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val plan = physicalPlan(
      graft.streaming.EventStreams.sessionTransitions(ev))
    assert(!plan.contains("Join"),
      s"prev/next/total margins must be windows, not aggregate join-backs:\n$plan")
    // one user window + the |types|²-sized matrix aggregation + its
    // margin windows — the fact table shuffles exactly once
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges <= 4,
      s"expected ≤4 hash exchanges (user window, matrix agg, 2 margin windows):\n$plan")
  }

  test("zone-map audit (x126): no layout-only window over the fact; ntile replaced by two-phase ranks") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
    // Unpinned: the structural contract under test is the CONSTRUCTION
    // plan — the Local pin (round 19) would expose only its
    // materialized leaf (the identical tree, executed at pin time)
    val plan = physicalPlan(graft.operators.LayoutOps.zoneMapAudit(li,
      col("l_partkey"), col("l_suppkey"),
      Seq(col("l_orderkey"), col("l_linenumber")),
      state = graft.operators.DedupOps.Unpinned))
    // scale truth (this pin once asserted `exchanges === 1`, which
    // locked IN the 2-task layout window): `layout` has two values, so
    // any window partitioned on it alone sorts half the exploded fact
    // per task — every fact-side window must carry the two-phase __bk
    // bucket, file ids come from closed-form ntile arithmetic over
    // broadcast rank offsets (no ntile operator anywhere), no
    // fact-side shuffle join, and the fact is scanned exactly three
    // times (dim stats, bucket counts, main)
    assert(!keyOnlyWindow("layout").pattern.matcher(plan).find(),
      s"found a window partitioned on layout without the __bk bucket:\n$plan")
    assert(!plan.contains("ntile"),
      s"file ids must be closed-form over two-phase ranks, not ntile:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"rank offsets must broadcast onto the fact:\n$plan")
    assertOnlyBroadcastJoins(plan)
    assert(plan.split("FileScan").length - 1 <= 4,
      s"expected ≤4 column-pruned scans (dim stats ×2 branches, bucket counts, main):\n$plan")
  }
}

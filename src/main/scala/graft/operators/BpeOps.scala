package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps.{IterState, Local}

/** In-engine byte-pair-encoding tokenizer: train a merge table from the
  * corpus with bounded merge rounds, apply it as a chained-`replace`
  * column expression — true subword counts instead of the "BPE-ish
  * regex" proxy (upgrades the x37 token budgets / x102 fertility class).
  *
  * Algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
  * of Rare Words with Subword Units", arXiv:1508.07909): start from the
  * per-word character segmentation, repeatedly count adjacent symbol
  * pairs (weighted by word frequency) and merge the most frequent pair,
  * greedily left-to-right within each word.
  *
  * Representation: a word's segmentation is ONE string — each symbol
  * WRAPPED in its own separators (`low` → `␟l␟␟o␟␟w␟`).
  * Merging pair (a,b) is then exactly `replace(syms, "␟a␟␟b␟",
  * "␟ab␟")`: both engines' `replace` substitutes non-overlapping
  * occurrences scanning left-to-right, which IS the greedy merge
  * ("␟a␟␟a␟␟a␟" → "␟aa␟␟a␟"; each occurrence owns its
  * separators, so back-to-back occurrences like ␟a␟␟b␟␟a␟␟b␟ both
  * merge). The earlier LEADING-only representation (`␟l␟o␟w`, pattern
  * `␟a␟b`) diverged subtly from Sennrich BPE: the pattern's right side
  * could match a PREFIX of a longer symbol (`replace("␟f␟ga", "␟f␟g",
  * "␟fg")` glues f with just the g of ga → symbol "fga"), merging pairs
  * never trained as complete symbols — wrapping both sides closes it,
  * in training and application, on both engines (the native applier's
  * textbook semantics surfaced it; BpeParitySpec pins the cases).
  *
  * Scale shape (the Borůvka pattern, [[DedupOps.dupClusters]]): the
  * corpus is tokenized ONCE into a distinct-word/frequency VOCAB table —
  * everything after is vocab-sized, never corpus-sized. Each round is
  * one pair-explode + one partial-agg shuffle on the pair key + a
  * TakeOrderedAndProject top-1; the driver holds only the R chosen
  * merges (loop control), and `state.pin` bounds lineage per round.
  * Apply builds a (word → subword count) LEXICON from the same vocab and
  * joins it back — each distinct word is segmented once per corpus, not
  * once per occurrence.
  *
  * Determinism: the merge choice orders by (count DESC, left, right) —
  * binary UTF-8 string order in both engines — so training is a pure
  * function of the corpus, and a TRAINED model's merges embed as SQL
  * literals in a generated DuckDB twin that replays every round: round
  * k's top pair is recomputed RELATIONALLY from the k-times-merged vocab
  * and must equal the embedded literal (any divergence hash-fails the
  * gate), the vocab advancing by literal replaces exactly as Spark did.
  */
object BpeOps {

  /** Symbol separator: an ASCII control char that never appears in text
    * (words containing it are excluded — identically — on both engines). */
  val SEP = "\u001F"

  /** A trained merge table: (left, right, pair count at selection time),
    * in merge order. */
  final case class BpeModel(merges: Seq[(String, String, Long)])

  /** Distinct-word vocabulary with frequencies and the initial
    * character segmentation: `(word, freq, syms)`. */
  def vocab(df: DataFrame, text: Column = col("text")): DataFrame =
    df.select(explode(TextOps.wordsRe(text)).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(SEP))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        regexp_replace(col("word"), "(.)", SEP + "$1" + SEP).as("syms"))

  /** Adjacent symbol pairs of a wrapped syms string: `split` on the
    * separator leaves empties between/around symbols — drop them, pairs
    * are `(s_i, s_{i+1})` of what remains. */
  private def pairsCol: Column = {
    val a = array_remove(split(col("syms"), SEP), "")
    val n = greatest(size(a) - 1, lit(0))
    arrays_zip(slice(a, lit(1), n), slice(a, lit(2), n))
  }

  /** Train `rounds` merges (fewer if the vocabulary runs out of pairs). */
  def train(df: DataFrame, rounds: Int, text: Column = col("text"),
            state: IterState = Local): BpeModel = {
    var v = state.pin(vocab(df, text).select(col("syms"), col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (merges.length < rounds && !exhausted) {
      val top = v.select(explode(pairsCol).as("p"), col("freq"))
        .groupBy(col("p.0").as("l"), col("p.1").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0); val r = top(0).getString(1)
        merges += ((l, r, top(0).getLong(2)))
        v = state.pin(v.withColumn("syms",
          replace(col("syms"), lit(SEP + l + SEP + SEP + r + SEP),
            lit(SEP + l + r + SEP))))
      }
    }
    BpeModel(merges.toSeq)
  }

  /** The trained merge table as a DataFrame:
    * `(rank, left, right, merged, pair_count)`. */
  def mergesDf(spark: SparkSession, model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r, c), i) => (i, l, r, l + r, c) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Final segmentation of the initial `syms` column under the model:
    * the R merges as chained replaces — the SEMANTIC REFERENCE form and
    * the DuckDB-twin representation, fine inline up to the gated ~64
    * merges but one expression NODE per merge (a 32k-merge production
    * table would be a 32k-deep tree). Production path:
    * [[segmentedNative]]; BpeParitySpec pins the two equal on trained
    * models, and the x112/x114 oracle hashes re-pin it per round (the
    * twin replays THIS form in DuckDB against the native Spark side). */
  def segmented(model: BpeModel, syms: Column = col("syms")): Column =
    model.merges.foldLeft(syms) { case (c, (l, r, _)) =>
      replace(c, lit(SEP + l + SEP + SEP + r + SEP), lit(SEP + l + r + SEP))
    }

  /** Production segmentation: the whole merge table applied natively in
    * one compiled call per distinct word (rank-heap over present pairs,
    * [[graft.functions.BpeUtils.segment]]) — handles production-sized
    * (32k+) tables where chained replaces stop being a plan. Takes the
    * RAW word; the code-point pre-segmentation happens in-kernel. */
  def segmentedNative(model: BpeModel, word: Column): Column =
    graft.functions.BpeExpressions.bpeSegment(word,
      graft.functions.BpeRanks(
        model.merges.map { case (l, r, _) => (l, r) }.toIndexedSeq))

  /** x112: per-document true-subword counts under a trained model —
    * `(doc_id, n_words, n_subwords, fertility)` where fertility is
    * subwords per word (the real tokenizer-cost statistic x102
    * approximates with a regex). Docs with zero qualifying words carry
    * no row (both engines agree).
    *
    * One-tokenization shape: the corpus explodes ONCE into the
    * (doc_id, word, ct) occurrence matrix; the lexicon (each distinct
    * word segmented once via the chained replaces) derives from that
    * SAME relation — the `ct >= 1` tautology blocks
    * RemoveRedundantAggregates from collapsing the keys-only derivation
    * into a second corpus scan (the x75/x80 trap), so AQE serves the
    * lexicon branch from the matrix exchange (ReusedExchange,
    * PlanShapeSpec-pinned). Per-doc totals weight by ct. */
  def applyCounts(df: DataFrame, model: BpeModel,
                  text: Column = col("text")): DataFrame = {
    val pdw = df
      .select(col("doc_id"), explode(TextOps.wordsRe(text)).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(SEP))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("ct"))
      .filter(col("ct") >= 1)
    // native single-call segmentation (the production path — the DuckDB
    // twin replays the chained-replace reference form, so the gate's
    // hash equality IS the native==chained proof on the trained model)
    val seg = segmentedNative(model, col("word"))
    // wrapped representation: every symbol carries TWO separators
    val lex = pdw.groupBy("word").agg(count(lit(1)).as("wdf"))
      .filter(col("wdf") >= 1)
      .select(col("word"),
        ((length(seg) - length(replace(seg, lit(SEP), lit(""))))
          .cast("long") / lit(2L)).cast("long").as("n_sub"))
    pdw.join(lex, Seq("word"))
      .groupBy("doc_id")
      .agg(sum(col("ct")).as("n_words"),
        sum(col("ct") * col("n_sub")).as("n_subwords"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        (col("n_subwords").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
  }

  /** x114: token-budget selection priced in TRUE subwords — the
    * [[SamplingOps.tokenBudgetSample]] greedy-fill (stable-hash order per
    * stratum, cumulative-exclusive sum under the budget) with the cost
    * column upgraded from whitespace words to the trained model's
    * subword counts: what a training run will actually pay for the doc.
    * Same determinism contract (hash60 order, doc_id tie-break, budget
    * compared against the EXCLUSIVE prefix so the first doc of a stratum
    * always ships); one lexicon join + one stratum-keyed window. */
  def subwordBudgetSample(df: DataFrame, model: BpeModel,
                          budgetSubwords: Long, seed: Int = 0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum")
      .orderBy(graft.functions.HashFunctions.hash60(col("doc_id"), seed),
        col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col("doc_id"), col("lang").as("stratum"))
      .join(applyCounts(df, model).select(col("doc_id"), col("n_subwords")),
        Seq("doc_id"))
      .withColumn("cum_excl", coalesce(sum(col("n_subwords")).over(w), lit(0L)))
      .filter(col("cum_excl") < budgetSubwords)
      .select(col("doc_id"), col("stratum"), col("n_subwords"), col("cum_excl"))
  }

  /** DuckDB twin of [[subwordBudgetSample]]. */
  def subwordBudgetSampleSql(model: BpeModel, budgetSubwords: Long,
                             seed: Int = 0): String =
    s"""WITH sb_counts AS (
       |  SELECT doc_id, n_subwords FROM (
       |${applyCountsSql(model)}
       |  )
       |), sb_t AS (
       |  SELECT d.doc_id, d.lang AS stratum, c.n_subwords,
       |    ${graft.functions.HashFunctions.hash60Sql("d.doc_id", seed)} AS h
       |  FROM documents d JOIN sb_counts c USING (doc_id)
       |)
       |SELECT doc_id, stratum, n_subwords, CAST(cum_excl AS BIGINT) AS cum_excl
       |FROM (
       |  SELECT doc_id, stratum, n_subwords,
       |    coalesce(sum(n_subwords) OVER (PARTITION BY stratum
       |      ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
       |  FROM sb_t
       |)
       |WHERE cum_excl < $budgetSubwords""".stripMargin

  // ---- generated DuckDB twins (trained-model literal replay) ------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
  /** `␟l␟␟r␟` and `␟lr␟` as DuckDB expressions (chr(31) concat — the
    * control char never appears raw in the SQL text). */
  private def patLit(l: String, r: String): String =
    s"chr(31) || ${sqlLit(l)} || chr(31) || chr(31) || ${sqlLit(r)} || chr(31)"
  private def repLit(l: String, r: String): String =
    s"chr(31) || ${sqlLit(l + r)} || chr(31)"

  /** Shared vocab CTEs: `bpe_w(word, freq)` + `v0(syms, freq)`. */
  private def vocabSql: String =
    s"""bpe_w AS (
       |  SELECT word, count(*) AS freq
       |  FROM (SELECT unnest(${TextOps.wordsReSql("text")}) AS word
       |        FROM documents)
       |  WHERE length(word) > 0 AND word NOT LIKE '%' || chr(31) || '%'
       |  GROUP BY word
       |), v0 AS (
       |  SELECT word, freq,
       |    regexp_replace(word, '(.)', chr(31) || '\\1' || chr(31), 'g') AS syms
       |  FROM bpe_w
       |)""".stripMargin

  /** DuckDB twin of [[train]]+[[mergesDf]]: an UNROLLED replay of every
    * round — round k's winning pair is recomputed relationally from the
    * k-times-merged vocab (the merges applied so far being the model's
    * literals, exactly the centroid-literal pattern of
    * [[IvfOps.topKSql]]); a training divergence in either engine breaks
    * the hash equality. */
  def trainSql(model: BpeModel): String = {
    val rounds = model.merges.zipWithIndex.map { case ((l, r, _), k) =>
      s"""p$k AS (
         |  SELECT arr[i] AS l, arr[i + 1] AS r, sum(freq) AS cnt
         |  FROM (SELECT arr, freq,
         |          unnest(generate_series(1, len(arr) - 1)) AS i
         |        FROM (SELECT list_filter(string_split(syms, chr(31)),
         |                bpe_s -> bpe_s != '') AS arr, freq
         |              FROM v$k))
         |  GROUP BY arr[i], arr[i + 1]
         |), m$k AS (
         |  SELECT CAST($k AS INT) AS rank, l AS "left", r AS "right",
         |    l || r AS merged, CAST(cnt AS BIGINT) AS pair_count
         |  FROM p$k ORDER BY cnt DESC, l, r LIMIT 1
         |), v${k + 1} AS (
         |  SELECT replace(syms, ${patLit(l, r)}, ${repLit(l, r)}) AS syms,
         |    freq
         |  FROM v$k
         |)""".stripMargin
    }.mkString(",\n")
    val out = model.merges.indices
      .map(k => s"SELECT * FROM m$k").mkString("\nUNION ALL ")
    s"WITH $vocabSql,\n$rounds\n$out"
  }

  /** SQL fragment: the model's literal merges as R nested `replace`s
    * over a wrapped-symbol column named `syms` — the segmentation core
    * shared by [[applyCountsSql]] and by twins that build their lexicon
    * over a relation other than `documents` (x154's release pair). */
  def segSql(model: BpeModel): String =
    model.merges.foldLeft("syms") { case (e, (l, r, _)) =>
      s"replace($e, ${patLit(l, r)}, ${repLit(l, r)})"
    }

  /** DuckDB twin of [[applyCounts]]: the literal merges collapse to R
    * nested replaces over the distinct-word lexicon, joined back onto
    * the exploded documents. */
  def applyCountsSql(model: BpeModel): String = {
    val seg = segSql(model)
    s"""WITH $vocabSql,
       |bpe_lex AS (
       |  SELECT word,
       |    CAST((length(s) - length(replace(s, chr(31), ''))) // 2 AS BIGINT)
       |      AS n_sub
       |  FROM (SELECT word, $seg AS s FROM v0)
       |),
       |bpe_docw AS (
       |  SELECT doc_id, word
       |  FROM (SELECT doc_id, unnest(${TextOps.wordsReSql("text")}) AS word
       |        FROM documents)
       |  WHERE length(word) > 0 AND word NOT LIKE '%' || chr(31) || '%'
       |)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(x.n_sub) AS BIGINT) AS n_subwords,
       |  CAST(sum(x.n_sub) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS fertility
       |FROM bpe_docw d JOIN bpe_lex x USING (word)
       |GROUP BY d.doc_id""".stripMargin
  }

  /** x142: per-source tokenizer compression audit — characters per
    * subword and fertility under the trained model, by source. The
    * data-quality read a tokenizer owner runs per ingest feed: clean
    * prose compresses at several chars/subword; boilerplate, gibberish,
    * or wrong-script feeds fragment toward character-level
    * segmentation (cps → ~1e6 micro) and show up here before they show
    * up in training loss. Chars come from the table's n_chars column —
    * no text re-scan; numerators ride DECIMAL(38,0)/HUGEINT (the
    * mixtureTemperature overflow convention) so trillion-char sources
    * cannot ANSI-throw. One doc-keyed join of the x112 counts onto the
    * (doc_id, source, n_chars) projection, then a source-sized
    * aggregate. */
  def compressionBySource(df: DataFrame, model: BpeModel): DataFrame =
    applyCounts(df, model)
      .join(df.select(col("doc_id"), col("source"), col("n_chars")),
        Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_subwords"), col("n_chars"),
        expr("CAST((CAST(n_chars AS DECIMAL(38,0)) * 1000000) div n_subwords AS BIGINT)")
          .as("cps_micro"),
        expr("CAST((CAST(n_subwords AS DECIMAL(38,0)) * 1000000) div n_words AS BIGINT)")
          .as("fertility_micro"))

  /** x145: merge utilization and compression curve — for every trained
    * merge, how many times it actually FIRES on the corpus (applications
    * of the replace, weighted by word frequency) and the corpus-wide
    * subword count after it — the read that sizes a production
    * vocabulary: the rank where the curve flattens is the vocab you
    * need, and merges with trivial fire counts are dead weight. Note
    * `n_fires <= pair_count`: selection counts every ADJACENT pair
    * (overlapping — `aaa` holds two `(a,a)` pairs) where application is
    * non-overlapping left-to-right (`aaa` absorbs ONE `aa` merge), so
    * the two statistics answer different questions and both are kept.
    *
    * Shape: everything is vocab-sized (the [[train]] discipline — one
    * corpus tokenization into the distinct-word/frequency table, then R
    * chained replaces). Each round's application count falls out of the
    * REPRESENTATION: one application removes exactly two separators, so
    * fires = Σ freq·(len(syms_k) − len(syms_{k+1}))/2, and the running
    * subword count is Σ freq·(len(syms_k) − len(word))/2 (each
    * surviving symbol owns two separators). One aggregate row carries
    * all 2R sums (DECIMAL numerators per the x133 overflow convention);
    * the R output rows explode from it — no per-round scans, no joins.
    * Each round's projection references the previous `syms` twice
    * (delta + next), which is the SPARK-36718 condition that keeps the
    * chain linear instead of inlining round k into round k+1. */
  def mergeUtilization(df: DataFrame, model: BpeModel): DataFrame = {
    require(model.merges.nonEmpty, "empty model")
    var v = vocab(df).select(col("freq"), col("syms"),
      length(col("word")).cast("long").as("blen"))
    model.merges.zipWithIndex.foreach { case ((l, r, _), k) =>
      val nxt = replace(col("syms"),
        lit(SEP + l + SEP + SEP + r + SEP), lit(SEP + l + r + SEP))
      v = v.withColumn(s"__n$k", nxt)
        .withColumn(s"d$k",
          (length(col("syms")) - length(col(s"__n$k"))).cast("long"))
        .withColumn(s"ln$k", length(col(s"__n$k")).cast("long"))
        .drop("syms").withColumnRenamed(s"__n$k", "syms")
    }
    val aggs = model.merges.indices.flatMap { k => Seq(
      sum((col("freq") * col(s"d$k")).cast("decimal(38,0)")).as(s"f$k"),
      sum((col("freq") * (col(s"ln$k") - col("blen")))
        .cast("decimal(38,0)")).as(s"s$k"))
    }
    val one = v.agg(aggs.head, aggs.tail: _*)
    val rows = model.merges.zipWithIndex.map { case ((l, r, c), k) =>
      struct(lit(k.toLong).as("rank"), lit(l).as("left"), lit(r).as("right"),
        lit(l + r).as("merged"), lit(c).as("pair_count"),
        expr(s"CAST(f$k div 2 AS BIGINT)").as("n_fires"),
        expr(s"CAST(s$k div 2 AS BIGINT)").as("n_subwords_after"))
    }
    one.select(explode(array(rows: _*)).as("m")).select(col("m.*"))
  }

  /** DuckDB twin of [[mergeUtilization]]: the same vocab chain as
    * [[trainSql]], each round MATERIALIZED (a plain CTE inlines per
    * reference and every round is referenced twice — the k-core 3^8
    * lesson), deltas read off the representation identically. */
  def mergeUtilizationSql(model: BpeModel): String = {
    val rounds = model.merges.zipWithIndex.map { case ((l, r, _), k) =>
      s"""w${k + 1} AS MATERIALIZED (
         |  SELECT replace(syms, ${patLit(l, r)}, ${repLit(l, r)}) AS syms,
         |    freq, blen,
         |    length(syms) - length(replace(syms, ${patLit(l, r)},
         |      ${repLit(l, r)})) AS delta
         |  FROM w$k
         |)""".stripMargin
    }.mkString(",\n")
    val outs = model.merges.zipWithIndex.map { case ((l, r, c), k) =>
      s"""SELECT CAST($k AS BIGINT) AS rank, ${sqlLit(l)} AS "left",
         |  ${sqlLit(r)} AS "right", ${sqlLit(l + r)} AS merged,
         |  CAST($c AS BIGINT) AS pair_count,
         |  CAST(sum(freq * delta) // 2 AS BIGINT) AS n_fires,
         |  CAST(sum(freq * (length(syms) - blen)) // 2 AS BIGINT)
         |    AS n_subwords_after
         |FROM w${k + 1}""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $vocabSql,
       |w0 AS MATERIALIZED (
       |  SELECT syms, freq, CAST(length(word) AS BIGINT) AS blen FROM v0
       |),
       |$rounds
       |$outs""".stripMargin
  }

  /** x152 support: prune a trained model to the merges that EARN their
    * slot — fire count ≥ `minFires` on the corpus (x145's read turned
    * into the action it motivates) — with the constructibility CASCADE:
    * a surviving merge must also be able to EXIST, i.e. both its
    * symbols are single codepoints or outputs of ALREADY-RETAINED
    * earlier merges (dropping a low-utility merge invalidates every
    * later merge that consumes its fused symbol; keeping such orphans
    * would be dead table weight by construction). Pure driver
    * computation over the R-row fire table — the BPE loop-control
    * discipline. */
  def pruneModel(model: BpeModel, fires: Map[Int, Long],
                 minFires: Long): BpeModel = {
    val made = scala.collection.mutable.Set.empty[String]
    def constructible(s: String): Boolean =
      s.codePointCount(0, s.length) == 1 || made.contains(s)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    model.merges.zipWithIndex.foreach { case (m @ (l, r, _), k) =>
      if (fires.getOrElse(k, 0L) >= minFires &&
        constructible(l) && constructible(r)) {
        kept += m; made += (l + r)
      }
    }
    BpeModel(kept.toSeq)
  }

  /** x152: vocabulary-pruning round-trip — re-price every document
    * under the pruned model beside the full one:
    * `(doc_id, n_sub_full, n_sub_pruned, inflation_ppm)`. The read
    * that closes x145's loop: x145 says which merges idle, this says
    * what CUTTING them costs where it matters (tokens a training run
    * pays for). Inflation is exact integer ppm and SIGNED: usually
    * positive, but removing a merge can unblock two later ones (drop
    * `(x,y)` while `(w,x)`/`(y,z)` survive on `wxyz` → 2 symbols where
    * the full model left 3), so negative rows are legitimate and the
    * report keeps them. Two [[applyCounts]] passes
    * (one per model — each vocab-sized after its own single
    * tokenization) meeting in one doc-keyed join. */
  def pruneRepriceCounts(df: DataFrame, model: BpeModel,
                         pruned: BpeModel): DataFrame = {
    val full = applyCounts(df, model)
      .select(col("doc_id"), col("n_subwords").as("n_sub_full"))
    val cut = applyCounts(df, pruned)
      .select(col("doc_id"), col("n_subwords").as("n_sub_pruned"))
    // signed ratio via a POSITIVE division then the -1e6 shift: `div`
    // truncates toward zero on Spark but floors on DuckDB, so a signed
    // numerator would hash-diverge on any negative row — both operands
    // here are positive, both engines floor identically
    full.join(cut, Seq("doc_id"))
      .select(col("doc_id"), col("n_sub_full"), col("n_sub_pruned"),
        expr("CAST((CAST(n_sub_pruned AS DECIMAL(38,0)) * 1000000) " +
          "div n_sub_full - 1000000L AS BIGINT)").as("inflation_ppm"))
  }

  /** DuckDB twin of [[pruneRepriceCounts]] — both models' literal
    * replay, joined. */
  def pruneRepriceCountsSql(model: BpeModel, pruned: BpeModel): String =
    s"""WITH pr_full AS (
       |  SELECT doc_id, n_subwords AS n_sub_full FROM (
       |${applyCountsSql(model)}
       |  )
       |), pr_cut AS (
       |  SELECT doc_id, n_subwords AS n_sub_pruned FROM (
       |${applyCountsSql(pruned)}
       |  )
       |)
       |SELECT f.doc_id, f.n_sub_full, c.n_sub_pruned,
       |  CAST((CAST(c.n_sub_pruned AS HUGEINT) * 1000000)
       |    // f.n_sub_full - 1000000 AS BIGINT) AS inflation_ppm
       |FROM pr_full f JOIN pr_cut c USING (doc_id)""".stripMargin

  /** DuckDB twin of [[compressionBySource]]. */
  def compressionBySourceSql(model: BpeModel): String =
    s"""WITH bpe_counts AS (
       |${applyCountsSql(model)}
       |)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(c.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(c.n_subwords) AS BIGINT) AS n_subwords,
       |  CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
       |  CAST((CAST(sum(d.n_chars) AS HUGEINT) * 1000000)
       |    // sum(c.n_subwords) AS BIGINT) AS cps_micro,
       |  CAST((CAST(sum(c.n_subwords) AS HUGEINT) * 1000000)
       |    // sum(c.n_words) AS BIGINT) AS fertility_micro
       |FROM bpe_counts c JOIN documents d USING (doc_id)
       |GROUP BY d.source""".stripMargin
}

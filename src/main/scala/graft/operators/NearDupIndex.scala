package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps.{lshBands, minhashCoeffs, minhashPrime,
  minhashSignatures, numBands, numHashes, rowsPerBand, baseHashSql,
  shinglesSqlCteN, shingleWords}

/** Persisted near-dup SIGNATURE INDEX — incremental near-dup admission
  * for a continuously-growing corpus (the reference's staging tables
  * admit by exact hash only, `FileDbDAL/FileHandler.py:42-165`; x54
  * mirrors that. This closes the remaining gap: admitting a new shard
  * against 100 TB of ALREADY-SIGNED content without re-signing it).
  *
  * What persists (all for exact-dup clique REPRESENTATIVES only — the
  * contraction discipline, so a viral page is one posting however many
  * copies the corpus holds):
  *   - `cliques` (fp, rep, weight): every distinct content's md5, its
  *     min-doc_id representative and copy count — the exact-dup check,
  *     kept even for contents too short to sign. `weight` counts the
  *     copies IN THE EPOCH'S OWN BATCH only: a later batch's exact-
  *     rejected copies of already-indexed content increment nothing
  *     here (the rejected batch is not stored) — they land in that
  *     later epoch's `rejections` ledger instead;
  *   - `rejections` (fp, n_rejected): the REJECTED-COPY LEDGER — per
  *     indexed fingerprint, the batch copies this epoch's admission
  *     exact-rejected against it. Σ(weight) + Σ(n_rejected) per fp
  *     across the live epochs IS the corpus-wide copy count
  *     ([[virality]] reads it; the x186 gate pins it equal to a direct
  *     count over the whole corpus), so cross-epoch virality is
  *     reconstructible from the index alone — no verdict-stream
  *     accumulation needed. Near-rejected content is NOT ledgered: it
  *     is distinct content (its own fp), not a copy of anything;
  *   - `sigs` (doc_id, m0..m15): the 16-permutation MinHash signature
  *     per signed rep;
  *   - `bands` (doc_id, band, band_hash): the 4 LSH band postings per
  *     signed rep — the collision structure probes hit.
  *
  * Admission of a batch: contract the batch (in-batch exact dups
  * collapse first), sign ARRIVALS only, then
  *   (a) exact reject: batch fp already a clique fp (anti-join);
  *   (b) near reject: a band collision against the index whose
  *       signature ESTIMATE (matching components / 16, the Broder
  *       estimator x89 calibrates and x171 prices) reaches
  *       `minMatches`/16 — the sketch decision an incremental admitter
  *       must make, since the indexed corpus's shingle sets are gone;
  *       the estimate is exact integer arithmetic on both engines.
  * Cost is O(|incoming| + band collisions): the existing corpus is
  * never re-read, never re-signed — only its band postings are probed
  * at the incoming reps' own bucket keys.
  *
  * Layout & crash safety (the [[graft.core.AtomicDir]] discipline of
  * the ANN index, composed with epoch shards so EXTENSION writes are
  * O(|admitted|), never a corpus rewrite):
  * {{{
  *   root/epochs/<name>/{cliques,sigs,bands}   — immutable shards
  *   root/v<N>/manifest.json                   — the committed epoch list
  *   root/CURRENT                              — pointer (AtomicDir)
  * }}}
  * An epoch directory is fully written BEFORE the manifest naming it is
  * promoted; a crash at any instant leaves CURRENT resolving to a
  * complete manifest whose epochs are all complete — an orphaned epoch
  * dir is invisible garbage, never a half-read index
  * (NearDupIndexSpec's crash-anywhere test walks these states). */
object NearDupIndex {

  /** Estimate cutoff: `minMatches` of the 16 signature components —
    * 8/16 = the 0.5 Jaccard working point of the x8 pipeline. */
  val defaultMinMatches = 8

  /** Manifest entries carrying this prefix are TOMBSTONE epochs
    * (retractions), not data epochs. */
  private val TombPrefix = "tomb:"

  /** Compaction write sizing: each output range-partition targets this
    * many rows, so a 100 TB index rewrites across
    * ceil(rows / target) parallel tasks (one task only when the table
    * genuinely fits one — the sandbox case) instead of funnelling the
    * corpus through a single writer. ~8M posting-sized rows ≈ a few
    * hundred MB of parquet per file: scan-efficient, zone-map-friendly
    * (each range-partition is sorted by the probe key, so its file
    * carries a tight min/max that a broadcast probe prunes against). */
  val defaultCompactRowsPerPartition: Long = 8L * 1000 * 1000

  /** The manifest/locking/promotion machinery lives in
    * [[graft.core.EpochStore]], shared with [[SpanIndex]]. */
  private def lockFor(root: String): Object =
    graft.core.EpochStore.lockFor(root)

  /** ppm per matching component: 1e6 / 16 exactly. */
  private val ppmPerMatch = 1000000L / numHashes

  // ---- signing (shared by build, admit and extend) -------------------------

  /** Contract + sign a corpus: (cliques over ALL contents, rep sigs,
    * rep band postings). Unsignable cliques (rep shorter than
    * [[shingleWords]] words) keep their cliques row — the exact-dup
    * check must still see them — but have no sig/band postings. */
  private def signCorpus(df: DataFrame, text: Column)
      : (DataFrame, DataFrame, DataFrame) = {
    val keyed = df.select(col("doc_id"), md5(text).as("fp"))
      .filter(col("fp").isNotNull && col("doc_id").isNotNull)
    val cliques = keyed.groupBy("fp")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("weight"))
    val repDocs = df.join(cliques.select(col("rep").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val sigs = minhashSignatures(repDocs, text)
    (cliques, sigs, lshBands(sigs))
  }

  /** [[signCorpus]] through the session's [[graft.core.PinnedViews]]
    * cache: the analytic probe surfaces (admit / yield / audit /
    * guarded / banding) all sign the SAME batch — memoizing by
    * semantic plan signs it once per session, the memoPin discipline
    * of the dedup kernels. NOT used on the write paths
    * (build/extendEpoch): a streaming ingest signs a DIFFERENT batch
    * every micro-batch, and per-batch pins would accumulate in the
    * session cache for the stream's lifetime. */
  private def signCorpusPinned(df: DataFrame, text: Column)
      : (DataFrame, DataFrame, DataFrame) = {
    val (cliques, sigs, bands) = signCorpus(df, text)
    (graft.core.PinnedViews.pinned(cliques),
      graft.core.PinnedViews.pinned(sigs),
      graft.core.PinnedViews.pinned(bands))
  }

  /** Zero-row rejections ledger with the persisted schema. */
  private def emptyRejections(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(null).cast("string").as("fp"),
      lit(0L).as("n_rejected"))

  private def writeEpoch(cliques: DataFrame, sigs: DataFrame,
                         bands: DataFrame, rejections: DataFrame,
                         root: String): String =
    writeEpochNamed(cliques, sigs, bands, rejections, root,
      "e" + java.util.UUID.randomUUID().toString.take(12))

  private def writeEpochNamed(cliques: DataFrame, sigs: DataFrame,
                              bands: DataFrame, rejections: DataFrame,
                              root: String, name: String): String =
    graft.core.EpochStore.writeEpoch(root, name, Seq(
      "cliques" -> cliques, "sigs" -> sigs, "bands" -> bands,
      "rejections" -> rejections))

  private def currentToken(root: String): String =
    graft.core.EpochStore.currentToken(root)

  private def promoteManifestCas(root: String, epochs: Seq[String],
                                 expectToken: String): String =
    graft.core.EpochStore.promoteCas(root, epochs, expectToken)

  /** The committed epoch list of the live version. */
  def committedEpochs(root: String): Seq[String] =
    graft.core.EpochStore.committedEpochs(root)

  private case class Loaded(cliques: DataFrame, sigs: DataFrame,
                            bands: DataFrame)

  /** The LIVE view of the index: the union of the committed data
    * epochs with pending tombstones applied. A tombstone kills cliques
    * (and their rep's sig/band postings) from data epochs committed
    * BEFORE it only, so retracted content RE-ADMITTED by a later epoch
    * is live again — even under a replay that reuses the original
    * doc_ids. With no tombstones pending (the common state; [[compact]]
    * folds them away physically) this is one multi-path parquet read
    * per table; with tombstones pending, per-epoch reads carry the
    * epoch position and the kill set is a broadcast anti-join (the
    * tombstone set — takedowns — is small by nature). */
  private def load(spark: SparkSession, root: String): Loaded = {
    val eps = committedEpochs(root)
    require(eps.nonEmpty, s"empty index at $root")
    val dataE = eps.filterNot(_.startsWith(TombPrefix))
    require(dataE.nonEmpty, s"index at $root holds only tombstones")
    // each tombstone applies to the data epochs committed before it
    val tombs: Seq[(String, Int)] = eps.zipWithIndex.collect {
      case (e, i) if e.startsWith(TombPrefix) =>
        (e.stripPrefix(TombPrefix),
          eps.take(i).count(!_.startsWith(TombPrefix)))
    }
    def tbl(which: String): DataFrame =
      spark.read.parquet(dataE.map(e => s"$root/$e/$which"): _*)
    if (tombs.isEmpty)
      return Loaded(tbl("cliques"), tbl("sigs"), tbl("bands"))
    def posed(which: String): DataFrame = dataE.zipWithIndex.map {
      case (e, i) => spark.read.parquet(s"$root/$e/$which")
        .withColumn("__pos", lit(i))
    }.reduce(_ unionByName _)
    val tombFps = tombs.map { case (t, thresh) =>
      spark.read.parquet(s"$root/$t/tombstones")
        .select(col("fp"), lit(thresh).as("__thresh"))
    }.reduce(_ unionByName _)
    val posedCl = posed("cliques")
    val dead = posedCl.as("c").join(broadcast(tombFps).as("t"),
        col("c.fp") === col("t.fp") && col("c.__pos") < col("t.__thresh"))
      .select(col("c.fp").as("fp"), col("c.rep").as("rep"),
        col("c.__pos").as("__pos"))
      .distinct()
    def live(df: DataFrame, keys: Seq[String], kill: DataFrame): DataFrame =
      df.join(broadcast(kill), keys :+ "__pos", "left_anti").drop("__pos")
    val deadReps = dead.select(col("rep").as("doc_id"), col("__pos"))
    Loaded(
      live(posedCl, Seq("fp", "rep"), dead),
      live(posed("sigs"), Seq("doc_id"), deadReps),
      live(posed("bands"), Seq("doc_id"), deadReps))
  }

  /** Live rejections-ledger rows `(fp, n_rejected)` under the same
    * tombstone discipline as [[load]]: a tombstone kills ledger rows
    * written BEFORE it for its fingerprints (those copies were part of
    * the taken-down content), while rows accrued after a re-admission
    * stay. Epochs predating the ledger (no `rejections` dir) read as
    * empty. */
  private def loadRejections(spark: SparkSession, root: String): DataFrame = {
    val eps = committedEpochs(root)
    val dataE = eps.filterNot(_.startsWith(TombPrefix))
    val tombs: Seq[(String, Int)] = eps.zipWithIndex.collect {
      case (e, i) if e.startsWith(TombPrefix) =>
        (e.stripPrefix(TombPrefix),
          eps.take(i).count(!_.startsWith(TombPrefix)))
    }
    val present = dataE.zipWithIndex.filter { case (e, _) =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, e, "rejections"))
    }
    if (present.isEmpty) return emptyRejections(spark)
    if (tombs.isEmpty)
      return spark.read.parquet(
        present.map { case (e, _) => s"$root/$e/rejections" }: _*)
        .select(col("fp"), col("n_rejected"))
    val posed = present.map { case (e, i) =>
      spark.read.parquet(s"$root/$e/rejections").withColumn("__pos", lit(i))
    }.reduce(_ unionByName _)
    val tombFps = tombs.map { case (t, thresh) =>
      spark.read.parquet(s"$root/$t/tombstones")
        .select(col("fp"), lit(thresh).as("__thresh"))
    }.reduce(_ unionByName _)
    val dead = posed.as("r").join(broadcast(tombFps).as("t"),
        col("r.fp") === col("t.fp") && col("r.__pos") < col("t.__thresh"))
      .select(col("r.fp").as("fp"), col("r.__pos").as("__pos")).distinct()
    posed.join(broadcast(dead), Seq("fp", "__pos"), "left_anti")
      .select(col("fp"), col("n_rejected"))
  }

  // ---- public lifecycle ----------------------------------------------------

  /** Admission tier (a) — the ONE exact-content gate, shared by the
    * persisted index and [[DedupOps.incrementalDedup]] (x54)'s
    * non-persisted corpus refresh: contract `keyed` `(doc_id,
    * content_hash[, payload…])` to per-content minima and keep only
    * contents whose hash is absent from `existingKeys`
    * `(content_hash)`. Payload columns resolve to the min-doc_id copy's
    * values. The existing side is touched exactly once — a narrow key
    * projection feeding the anti-join (broadcast/Bloom when the batch,
    * not the corpus, is small) — never pairwise. [[admit]]'s exact tier
    * is this same relation in LABELED form (`dup_exact` rows kept for
    * the verdict stream instead of anti-joined away). */
  def exactAdmission(keyed: DataFrame, existingKeys: DataFrame): DataFrame = {
    val payload = keyed.columns.filterNot(Set("doc_id", "content_hash")).toSeq
    keyed
      .join(existingKeys.select(col("content_hash")),
        Seq("content_hash"), "left_anti")
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"),
        payload.map(c => min_by(col(c), col("doc_id")).as(c)): _*)
  }

  /** Build and promote the initial index for a corpus. Returns the
    * promoted version path. */
  def buildIndex(df: DataFrame, root: String,
                 text: Column = col("text")): String =
    lockFor(root).synchronized {
      val token = currentToken(root)
      val (cliques, sigs, bands) = signCorpus(df, text)
      val ep = writeEpoch(cliques, sigs, bands,
        emptyRejections(df.sparkSession), root)
      promoteManifestCas(root, Seq(ep), token)
    }

  /** Admission verdicts for a batch against the LIVE index — one row
    * per DISTINCT incoming content (in-batch exact dups collapse to the
    * min doc_id with their copy count):
    * `(doc_id, content_hash, n_batch_copies, verdict, best_est_ppm)`
    * with verdict ∈ {admitted, dup_exact, dup_near} and best_est_ppm
    * the strongest signature estimate among band-colliding indexed reps
    * (0 when nothing collides; an exact dup of signed content reads
    * 1000000 — identical signatures — and of unsignable content 0).
    *
    * In-batch NEAR-dups are both reported on their own merits (the
    * batch is admitted first, indexed second — [[extend]] signs the
    * admitted set, so the next batch sees them). */
  /** Per incoming rep, the strongest signature estimate among
    * band-colliding indexed reps: `(doc_id, best_matches)` — rows only
    * for reps with ≥1 collision. The shared probe of [[admit]] and
    * [[admissionYield]]. */
  /** Per band-colliding (incoming rep, indexed rep) pair, the signature
    * estimate's matching-component count: `(doc_id, old_rep, mc)`. */
  private def pairEstimates(inSigs: DataFrame, inBands: DataFrame,
                            idx: Loaded): DataFrame = {
    val cand = inBands.as("i")
      .join(idx.bands.as("e"),
        col("i.band") === col("e.band") &&
          col("i.band_hash") === col("e.band_hash"))
      .select(col("i.doc_id").as("doc_id"), col("e.doc_id").as("old_rep"))
      .distinct()
    val matchCnt = (0 until numHashes)
      .map(i => when(col(s"i_m$i") === col(s"e_m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val sigI = inSigs.select(col("doc_id") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"i_m$i")): _*)
    val sigE = idx.sigs.select(col("doc_id").as("old_rep") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"e_m$i")): _*)
    cand.join(sigI, Seq("doc_id")).join(sigE, Seq("old_rep"))
      .select(col("doc_id"), col("old_rep"), matchCnt.as("mc"))
  }

  private def bestEstimates(inSigs: DataFrame, inBands: DataFrame,
                            idx: Loaded): DataFrame =
    pairEstimates(inSigs, inBands, idx)
      .groupBy("doc_id").agg(max(col("mc")).as("best_matches"))

  /** `pin = false` skips the session signing cache — REQUIRED for
    * per-micro-batch callers ([[graft.streaming.AdmissionStream]]):
    * each batch is a distinct plan, and its pin would sit in the
    * session cache for the stream's lifetime. */
  def admit(incoming: DataFrame, root: String,
            minMatches: Int = defaultMinMatches,
            text: Column = col("text"), pin: Boolean = true): DataFrame =
    admitImpl(incoming, root, minMatches, text, pin)

  private def admitImpl(incoming: DataFrame, root: String,
                        minMatches: Int, text: Column,
                        pin: Boolean): DataFrame = {
    val idx = load(incoming.sparkSession, root)
    val (inCl, inSigs, inBands) =
      if (pin) signCorpusPinned(incoming, text) else signCorpus(incoming, text)
    val best = bestEstimates(inSigs, inBands, idx)
    val out = inCl
      .select(col("rep").as("doc_id"), col("fp").as("content_hash"),
        col("weight").as("n_batch_copies"))
      .join(idx.cliques.select(col("fp").as("content_hash"),
        lit(1).as("__exact")).distinct(), Seq("content_hash"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("content_hash"), col("n_batch_copies"),
        when(col("__exact").isNotNull, lit("dup_exact"))
          .when(col("best_matches") >= minMatches, lit("dup_near"))
          .otherwise(lit("admitted")).as("verdict"),
        (coalesce(col("best_matches"), lit(0L)) * ppmPerMatch)
          .as("best_est_ppm"))
    // PROBE-ONCE (round 19, guide §2.1): the verdict relation is a
    // deterministic, batch-sized function of (batch plan, live index
    // paths, minMatches) — the manifest consumers (x174/x190/x191/
    // x193/x194/x195/x197/x200) all derive from the identical plan, so
    // under the session signing discipline the index probe runs ONCE
    // per (batch, index) and every later consumer reads the ≤|batch|
    // pinned rows. Keyed by canonicalized plan: an extension/compaction
    // /retraction changes the epoch path set, so a mutated index can
    // never serve a stale verdict. pin=false (streaming) is untouched.
    if (pin) graft.core.PinnedViews.pinned(out) else out
  }

  /** [[admit]] under the x78/x182 hot-bucket discipline, applied to the
    * PROBE: index posting buckets holding more than `maxBucket` distinct
    * contents (a boilerplate template family concentrating at one band
    * value — x180's top size class, x184's refused population) are
    * excluded from candidate pairing, so a template-heavy batch probing
    * a template-heavy index pays O(|batch postings|) at those keys
    * instead of |batch postings|·|bucket|. The cap is never silent:
    * `n_hot_buckets` rides every verdict row — the count of the
    * incoming rep's own postings that landed in excluded buckets, so a
    * row admitted with collisions suppressed is visibly quarantinable
    * (`n_hot_buckets > 0` and the estimate may under-read). The EXACT
    * tier is untouched: a true exact dup is always rejected whatever
    * buckets burn. Feed `maxBucket` from [[indexSkew]]'s ladder. */
  def admitGuarded(incoming: DataFrame, root: String, maxBucket: Long,
                   minMatches: Int = defaultMinMatches,
                   text: Column = col("text")): DataFrame = {
    val idx = load(incoming.sparkSession, root)
    val (inCl, inSigs, inBands) = signCorpusPinned(incoming, text)
    val hot = idx.bands.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("m")).filter(col("m") > maxBucket)
      .select("band", "band_hash")
    val coldIn = inBands.join(broadcast(hot), Seq("band", "band_hash"),
      "left_anti")
    val nHot = inBands.join(broadcast(hot), Seq("band", "band_hash"),
        "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    val best = bestEstimates(inSigs, coldIn, idx)
    inCl
      .select(col("rep").as("doc_id"), col("fp").as("content_hash"),
        col("weight").as("n_batch_copies"))
      .join(idx.cliques.select(col("fp").as("content_hash"),
        lit(1).as("__exact")).distinct(), Seq("content_hash"), "left")
      .join(best, Seq("doc_id"), "left")
      .join(nHot, Seq("doc_id"), "left")
      .select(col("doc_id"), col("content_hash"), col("n_batch_copies"),
        when(col("__exact").isNotNull, lit("dup_exact"))
          .when(col("best_matches") >= minMatches, lit("dup_near"))
          .otherwise(lit("admitted")).as("verdict"),
        (coalesce(col("best_matches"), lit(0L)) * ppmPerMatch)
          .as("best_est_ppm"),
        coalesce(col("n_hot"), lit(0L)).as("n_hot_buckets"))
  }

  /** x178: admission-threshold YIELD CURVE — x174 admits at ONE
    * `minMatches` cutoff; this prices EVERY cutoff from the same probe
    * pass: per best-estimate value (0..16 matching components), the
    * distinct NON-exact incoming contents whose strongest index
    * collision reads exactly that estimate, with their batch copy
    * counts. The cumulative contents/copies at-or-above m are exactly
    * what a threshold of m near-rejects (exact dups are out of the
    * knob's reach and excluded); contents colliding with nothing sit at
    * 0 — admitted under every threshold, so the curve is total. The
    * knee is the minMatches to ship, read against x89's estimate-vs-
    * exact calibration of the same estimator.
    *
    * Scale: the identical O(|incoming| + collisions) probe as [[admit]]
    * plus one ≤17-row aggregate. */
  def admissionYield(incoming: DataFrame, root: String,
                     text: Column = col("text")): DataFrame = {
    val idx = load(incoming.sparkSession, root)
    val (inCl, inSigs, inBands) = signCorpusPinned(incoming, text)
    val best = bestEstimates(inSigs, inBands, idx)
    inCl.join(idx.cliques.select(col("fp")).distinct(), Seq("fp"),
        "left_anti")
      .select(col("rep").as("doc_id"), col("weight"))
      .join(best, Seq("doc_id"), "left")
      .select(coalesce(col("best_matches"), lit(0L)).as("best_matches"),
        col("weight"))
      .groupBy("best_matches")
      .agg(count(lit(1)).as("n_contents"), sum(col("weight")).as("n_copies"))
      .select(col("best_matches"),
        (col("best_matches") * ppmPerMatch).as("est_ppm"),
        col("n_contents"), col("n_copies"))
  }

  /** x179: admission-sketch AUDIT — the x96-of-the-index: the admitter
    * near-rejects on the SIGNATURE ESTIMATE (it cannot see the indexed
    * corpus's shingle sets); this confusion matrix says what that
    * sketch decision costs. Per non-exact incoming content: the
    * estimate verdict (best collision ≥ `minMatches`/16) against the
    * EXACT verdict (max exact Jaccard over the same collided pairs ≥
    * `threshold`, recomputed offline from both partitions' text — an
    * audit may touch what the admitter cannot). Four cells
    * `(est_reject, exact_reject)` with content and copy counts: the
    * (1,0) cell is good data the sketch would throw away, (0,1) is
    * near-dup mass it would let in — the numbers that justify (or
    * resize) `minMatches` before a 100 TB ingest trusts it.
    *
    * Scale: the shared probe plus exact Jaccard on COLLIDED pairs only
    * (never all pairs); one 4-row aggregate. */
  def admissionAudit(incoming: DataFrame, corpus: DataFrame, root: String,
                     minMatches: Int = defaultMinMatches,
                     threshold: Double = 0.5,
                     text: Column = col("text")): DataFrame = {
    val idx = load(incoming.sparkSession, root)
    val (inCl, inSigs, inBands) = signCorpusPinned(incoming, text)
    val pe = pairEstimates(inSigs, inBands, idx)
    val est = pe.groupBy("doc_id").agg(max(col("mc")).as("mm"))
    val exact = DedupOps.jaccardFor(corpus,
        pe.select(col("doc_id").as("doc_a"), col("old_rep").as("doc_b")),
        text)
      .groupBy(col("doc_a").as("doc_id"))
      .agg(max(col("jaccard")).as("mj"))
    inCl.join(idx.cliques.select(col("fp")).distinct(), Seq("fp"),
        "left_anti")
      .select(col("rep").as("doc_id"), col("weight"))
      .join(est, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(
        when(coalesce(col("mm"), lit(0L)) >= minMatches, 1).otherwise(0)
          .as("est_reject"),
        when(coalesce(col("mj"), lit(0.0)) >= threshold, 1).otherwise(0)
          .as("exact_reject"),
        col("weight"))
      .groupBy("est_reject", "exact_reject")
      .agg(count(lit(1)).as("n_contents"), sum(col("weight")).as("n_copies"))
  }

  /** The (bands × rows-per-band) splits [[bandingYield]] prices. The
    * shipped scheme is (4,4); (8,2) and (2,8) bracket it on the
    * recall-vs-probe-cost S-curve P(collide) = 1−(1−s^r)^b. r=1 is
    * deliberately absent: single-component collision is so permissive
    * it degenerates toward the all-pairs join the index exists to
    * avoid. */
  val bandingSchemes: Seq[(Int, Int)] = Seq((8, 2), (4, 4), (2, 8))

  /** x188: BANDING-SCHEME yield sweep — x171 prices how many signature
    * components the ESTIMATOR needs; this prices how the SAME 16
    * components should be cut into LSH bands, the index's other design
    * knob: per scheme (b bands × r rows), the candidate rep pairs the
    * probe would surface (the probe cost) and the non-exact incoming
    * contents/copies whose best estimate over those candidates reaches
    * `minMatches` (the recall at the shipped threshold — the estimator
    * itself is scheme-independent, only candidate visibility moves).
    * Read the smallest scheme whose near-reject yield matches the
    * widest one: rows-per-band buys probe cost, bands buy recall.
    *
    * Scale: signatures are computed ONCE per side (the persisted index
    * side comes off its `sigs` table — never re-signed); each scheme
    * adds b postings per rep (Σb = 14 rows/rep) and its own bucket
    * equi-join, everything downstream is pair-keyed then a ≤|schemes|
    * aggregate. */
  def bandingYield(incoming: DataFrame, root: String,
                   minMatches: Int = defaultMinMatches,
                   text: Column = col("text")): DataFrame = {
    val idx = load(incoming.sparkSession, root)
    val (inCl, inSigs, _) = signCorpusPinned(incoming, text)
    def postings(sigs: DataFrame): DataFrame = bandingSchemes.map {
      case (b, r) =>
        (0 until b).map { j =>
          sigs.select(col("doc_id"), lit(b).as("n_bands"),
            lit(j).as("band"),
            md5(concat_ws(",", (j * r until (j + 1) * r)
              .map(i => col(s"m$i").cast("string")): _*)).as("band_hash"))
        }.reduce(_ unionByName _)
    }.reduce(_ unionByName _)
    val cand = postings(inSigs).as("i")
      .join(postings(idx.sigs).as("e"),
        col("i.n_bands") === col("e.n_bands") &&
          col("i.band") === col("e.band") &&
          col("i.band_hash") === col("e.band_hash"))
      .select(col("i.n_bands").as("n_bands"), col("i.doc_id").as("doc_id"),
        col("e.doc_id").as("old_rep"))
      .distinct()
    val matchCnt = (0 until numHashes)
      .map(i => when(col(s"i_m$i") === col(s"e_m$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val sigI = inSigs.select(col("doc_id") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"i_m$i")): _*)
    val sigE = idx.sigs.select(col("doc_id").as("old_rep") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"e_m$i")): _*)
    val est = cand.join(sigI, Seq("doc_id")).join(sigE, Seq("old_rep"))
      .select(col("n_bands"), col("doc_id"), col("old_rep"),
        matchCnt.as("mc"))
    val nonExact = inCl
      .join(idx.cliques.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .select(col("rep").as("doc_id"), col("weight"))
    val best = est.groupBy("n_bands", "doc_id").agg(max(col("mc")).as("mm"))
    val rejects = nonExact.join(best, Seq("doc_id"))
      .filter(col("mm") >= minMatches)
      .groupBy("n_bands")
      .agg(count(lit(1)).as("n_near_contents"),
        sum(col("weight")).as("n_near_copies"))
    val pairs = est.groupBy("n_bands").agg(count(lit(1)).as("n_cand_pairs"))
    val schemeRel = bandingSchemes.map { case (b, r) =>
      incoming.sparkSession.range(1).select(lit(b).as("n_bands"),
        lit(r).as("rows_per_band"))
    }.reduce(_ unionByName _)
    schemeRel.join(pairs, Seq("n_bands"), "left")
      .join(rejects, Seq("n_bands"), "left")
      .select(col("n_bands"), col("rows_per_band"),
        coalesce(col("n_cand_pairs"), lit(0L)).as("n_cand_pairs"),
        coalesce(col("n_near_contents"), lit(0L)).as("n_near_contents"),
        coalesce(col("n_near_copies"), lit(0L)).as("n_near_copies"))
  }

  /** DuckDB twin of [[bandingYield]] over the gate's 80/20 split. */
  def bandingYieldSql(minMatches: Int = defaultMinMatches): String = {
    def posts(p: String): String = bandingSchemes.map { case (b, r) =>
      (0 until b).map { j =>
        val cols = (j * r until (j + 1) * r)
          .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || ',' || ")
        s"SELECT doc_id, $b AS n_bands, $j AS band, md5($cols) AS band_hash" +
          s" FROM ${p}_sig"
      }.mkString("\n  UNION ALL\n  ")
    }.mkString("\n  UNION ALL\n  ")
    val schemes = bandingSchemes.map { case (b, r) =>
      s"SELECT $b AS n_bands, $r AS rows_per_band"
    }.mkString(" UNION ALL ")
    s"""$admissionCtes,
       |bw_in_p AS (
       |  ${posts("ndx_in")}
       |),
       |bw_ex_p AS (
       |  ${posts("ndx_ex")}
       |),
       |bw_cand AS (
       |  SELECT DISTINCT i.n_bands, i.doc_id, e.doc_id AS old_rep
       |  FROM bw_in_p i JOIN bw_ex_p e
       |    ON i.n_bands = e.n_bands AND i.band = e.band
       |      AND i.band_hash = e.band_hash
       |),
       |bw_est AS (
       |  SELECT c.n_bands, c.doc_id, c.old_rep, ($estSql) AS mc
       |  FROM bw_cand c
       |  JOIN ndx_in_sig si ON si.doc_id = c.doc_id
       |  JOIN ndx_ex_sig se ON se.doc_id = c.old_rep
       |),
       |bw_pairs AS (
       |  SELECT n_bands, CAST(count(*) AS BIGINT) AS n_cand_pairs
       |  FROM bw_est GROUP BY n_bands
       |),
       |bw_best AS (
       |  SELECT n_bands, doc_id, max(mc) AS mm FROM bw_est
       |  GROUP BY n_bands, doc_id
       |),
       |bw_rej AS (
       |  SELECT b.n_bands, CAST(count(*) AS BIGINT) AS n_near_contents,
       |    CAST(sum(i.weight) AS BIGINT) AS n_near_copies
       |  FROM ndx_in_cl i
       |  ANTI JOIN ndx_ex_cl e USING (fp)
       |  JOIN bw_best b ON b.doc_id = i.doc_id
       |  WHERE b.mm >= $minMatches
       |  GROUP BY b.n_bands
       |),
       |bw_schemes AS ($schemes)
       |SELECT s.n_bands, s.rows_per_band,
       |  CAST(coalesce(p.n_cand_pairs, 0) AS BIGINT) AS n_cand_pairs,
       |  CAST(coalesce(r.n_near_contents, 0) AS BIGINT) AS n_near_contents,
       |  CAST(coalesce(r.n_near_copies, 0) AS BIGINT) AS n_near_copies
       |FROM bw_schemes s
       |LEFT JOIN bw_pairs p USING (n_bands)
       |LEFT JOIN bw_rej r USING (n_bands)""".stripMargin
  }

  /** The bucket-size ladder of [[indexSkew]]: powers of two to 1024. */
  private val skewLadder: Seq[Long] =
    Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L)

  /** x180: index bucket-SKEW profile — the probe-cost governor of the
    * persisted index: per LSH band, its posting buckets bucketed by
    * SIZE on a powers-of-two ladder, each size class reporting bucket
    * count, posting mass, and its collision mass Σ C(m,2) — the exact
    * probe fan-out an [[admit]] of matching content pays against that
    * class. A hot top class is a boilerplate band value (the corpus's
    * near-identical template family concentrating in one bucket) — the
    * evidence for a max-bucket probe guard (the x78 max-df discipline)
    * or a wider banding scheme, read BEFORE a 100 TB ingest probes it.
    * Sizes are DISTINCT-content counts (the index is contracted), so
    * exact-dup virality cannot inflate this profile — what remains is
    * genuine near-collision structure.
    *
    * Scale: one groupBy over the posting table + a ≤|bands|·|ladder|
    * aggregate; never touches text. */
  def indexSkew(spark: SparkSession, root: String): DataFrame = {
    import graft.functions.EdgeLadder
    val idx = load(spark, root)
    idx.bands.groupBy("band", "band_hash").agg(count(lit(1)).as("m"))
      .select(col("band"), col("m"),
        EdgeLadder.band(col("m"), skewLadder).as("size_band"))
      .groupBy("band", "size_band")
      .agg(count(lit(1)).as("n_buckets"), sum(col("m")).as("n_postings"),
        sum(expr("(m * (m - 1)) div 2")).as("collision_mass"))
      .select(col("band"), col("size_band"),
        EdgeLadder.hiEdge("size_band", skewLadder).as("size_hi"),
        col("n_buckets"), col("n_postings"), col("collision_mass"))
  }

  /** DuckDB twin of [[indexSkew]] over the gate's 80% partition. */
  def indexSkewSql: String = {
    import graft.functions.EdgeLadder
    s"""WITH ndx_ex_cl AS (
       |  SELECT md5(text) AS fp, min(doc_id) AS rep
       |  FROM documents
       |  WHERE doc_id % 5 <> 0 AND text IS NOT NULL AND doc_id IS NOT NULL
       |  GROUP BY md5(text)
       |),
       |${sigBandCtes("ndx_ex",
          "(SELECT d.doc_id, d.text FROM documents d " +
            "JOIN ndx_ex_cl c ON d.doc_id = c.rep)")},
       |sk_b AS (
       |  SELECT band, band_hash, CAST(count(*) AS BIGINT) AS m
       |  FROM ndx_ex_bands GROUP BY band, band_hash
       |),
       |sk_s AS (
       |  SELECT band, m,
       |    CAST(${EdgeLadder.bandSql("m", skewLadder)} AS BIGINT)
       |      AS size_band
       |  FROM sk_b
       |)
       |SELECT band, size_band,
       |  CAST(${EdgeLadder.hiEdgeSql("size_band", skewLadder)} AS BIGINT)
       |    AS size_hi,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(m) AS BIGINT) AS n_postings,
       |  CAST(sum(m * (m - 1) // 2) AS BIGINT) AS collision_mass
       |FROM sk_s GROUP BY band, size_band""".stripMargin
  }

  /** Admit a batch and commit the admitted contents as a new epoch —
    * the index grows by O(|admitted|) postings; nothing existing is
    * rewritten. Returns the promoted version path. */
  def extend(incoming: DataFrame, root: String,
             minMatches: Int = defaultMinMatches,
             text: Column = col("text")): String = {
    extendEpoch(incoming, root,
      "e" + java.util.UUID.randomUUID().toString.take(12), minMatches, text)
    graft.core.AtomicDir.current(root)
  }

  /** [[extend]] under a CALLER-CHOSEN epoch name — the idempotent-replay
    * form a streaming admitter needs ([[graft.streaming.NearDupStream]]
    * names epochs by micro-batch id). A name already ACCOUNTED for by
    * the committed manifest — present directly, or folded into a
    * merged epoch by a compaction (its `covered.json`) — is a
    * completed batch: returns false untouched, so a crash between a
    * tail compaction and the streaming checkpoint cannot make the
    * replay double-commit. A crashed earlier attempt (epoch staged or
    * even moved into place, manifest never promoted) is rebuilt from
    * scratch and atomically replaced — correct because the admitted
    * set is a deterministic function of the COMMITTED manifest, which
    * the crash did not advance. */
  def extendEpoch(incoming: DataFrame, root: String, epochName: String,
                  minMatches: Int = defaultMinMatches,
                  text: Column = col("text")): Boolean =
    lockFor(root).synchronized {
      graft.core.EpochStore.requireSafeEpochName(epochName)
      val token = currentToken(root)
      val committed = committedEpochs(root)
      if (hasEpoch(root, epochName)) false
      else {
        // sign ONCE and checkpoint (plain localCheckpoint, not the
        // session pin cache — a stream signs a different batch every
        // micro-batch, and these must be GC-reclaimable): the three
        // epoch-table writes and the verdict derivation all reuse it
        // instead of re-running md5+minhash per consumer
        val (inCl0, inSigs0, inBands0) = signCorpus(incoming, text)
        val inCl = graft.core.TransientPins.track(inCl0.localCheckpoint(true))
        val inSigs = graft.core.TransientPins.track(inSigs0.localCheckpoint(true))
        val inBands = graft.core.TransientPins.track(inBands0.localCheckpoint(true))
        val idx = load(incoming.sparkSession, root)
        val best = bestEstimates(inSigs, inBands, idx)
        val exact = idx.cliques.select(col("fp")).distinct()
        // the ledger: exact-rejected batch copies, keyed by the indexed
        // fingerprint they matched (== their own fp, by exactness)
        val rejections = inCl.join(exact, Seq("fp"), "left_semi")
          .select(col("fp"), col("weight").as("n_rejected"))
        val cliques = inCl.join(exact, Seq("fp"), "left_anti")
          .join(best.filter(col("best_matches") >= minMatches)
            .select(col("doc_id").as("rep")), Seq("rep"), "left_anti")
        val reps = cliques.select(col("rep").as("doc_id"))
        val ep = writeEpochNamed(cliques,
          inSigs.join(reps, Seq("doc_id"), "left_semi"),
          inBands.join(reps, Seq("doc_id"), "left_semi"),
          rejections, root, epochName)
        promoteManifestCas(root, committed :+ ep, token)
        true
      }
    }

  /** RETRACTION — the takedown/opt-out path a 100 TB index must have:
    * writes a TOMBSTONE epoch naming the retracted content fingerprints
    * and promotes a manifest carrying it (same stage → atomic-move →
    * promote discipline as data epochs, so a crash at any instant
    * leaves the old manifest live and complete). From that promotion
    * on, [[admit]] treats the fingerprints as absent — identical
    * content is RE-ADMITTABLE, and the retracted reps' band postings
    * stop near-rejecting anybody. A tombstone applies only to epochs
    * committed before it, so a re-admission is itself never killed.
    * [[compact]] folds tombstones away physically (the retracted rows
    * leave the disk). Returns the promoted version path. */
  def retract(fps: DataFrame, root: String): String =
    lockFor(root).synchronized {
      val token = currentToken(root)
      val committed = committedEpochs(root)
      val ep = graft.core.EpochStore.writeEpoch(root,
        "t" + java.util.UUID.randomUUID().toString.take(12),
        Seq("tombstones" -> fps.select(col("fp"))
          .filter(col("fp").isNotNull).distinct()))
      promoteManifestCas(root, committed :+ s"$TombPrefix$ep", token)
    }

  /** Range-bucketed rewrite of one table: ceil(rows / target) output
    * partitions, each globally range-disjoint in the probe key and
    * sorted within, so every parquet file carries a tight key min/max
    * a broadcast probe prunes against — and the write itself runs
    * across that many parallel tasks, never one corpus-sized task.
    * `rows` comes from the (already-counted) clique table to avoid a
    * second corpus count per table; a `scale` multiplier adapts it for
    * tables with a fixed fan-out (4 band postings per signed rep). */
  private def ranged(df: DataFrame, rows: Long, target: Long,
                     scale: Long, keys: Column*): DataFrame = {
    val n = math.max(1L, (rows * scale + target - 1) / target)
      .min(Int.MaxValue.toLong).toInt
    df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
  }

  /** Size-triggered epoch COMPACTION — the [[graft.streaming
    * .AnnIndexStream.compactIndex]] discipline for this index: a
    * long-lived ingest accretes one epoch (≥3 small parquet files) per
    * micro-batch, and every probe then pays file-open latency across
    * all of them. This rewrites the UNION of the committed epochs as
    * ONE epoch — each posting table RANGE-BUCKETED by its probe key
    * into ceil(rows / `targetRows`) partitions and sorted within, so
    * the rewrite parallelizes across the cluster (no corpus-sized
    * single task) and every output file carries a tight probe-key
    * min/max for scan pruning — and promotes a manifest naming only
    * it, with the same crash-anywhere guarantees as extension: the
    * compacted epoch stages and atomically moves before the manifest
    * promotes, readers resolve the old manifest (its epochs untouched)
    * or the new one, and prior versions survive for rollback. The
    * folded epochs' names persist in the compacted epoch's
    * `covered.json`, so a streaming batch's replay-idempotency check
    * ([[graft.core.EpochStore.isAccounted]]) survives the fold.
    * Returns the promoted version path. */
  def compact(spark: SparkSession, root: String,
              targetRows: Long = defaultCompactRowsPerPartition): String =
    lockFor(root).synchronized {
      val token = currentToken(root)
      val eps = committedEpochs(root)
      val idx = load(spark, root) // tombstones applied -> folded away here
      val rej = loadRejections(spark, root)
        .groupBy("fp").agg(sum(col("n_rejected")).as("n_rejected"))
      // one count sizes all three rewrites: sigs/bands are per signed
      // rep (≤ cliques, = 4x sigs), so cliques' count bounds them
      val nCl = idx.cliques.count()
      val name = "c" + java.util.UUID.randomUUID().toString.take(12)
      val covered = eps.flatMap(e =>
        graft.core.EpochStore.entryPath(e) +:
          graft.core.EpochStore.coveredNames(root, e))
      val ep = graft.core.EpochStore.writeEpoch(root, name, Seq(
        "cliques" -> ranged(idx.cliques, nCl, targetRows, 1, col("fp")),
        "sigs" -> ranged(idx.sigs, nCl, targetRows, 1, col("doc_id")),
        "bands" -> ranged(idx.bands, nCl, targetRows, numBands.toLong,
          col("band"), col("band_hash")),
        "rejections" -> rej), covered)
      promoteManifestCas(root, Seq(ep), token)
    }

  /** TIERED (tail) compaction — the bounded-cost maintenance a
    * long-lived ingest actually runs: [[compact]] rewrites the WHOLE
    * index, O(corpus), while a streaming admitter accretes many SMALL
    * epochs on top of one big base. This merges only the accretion
    * TAIL — the all-data manifest suffix after the last tombstone,
    * always excluding the first manifest entry (the protected BASE,
    * typically the original [[buildIndex]] corpus) — into one epoch
    * and leaves everything before it untouched on disk, so the cost is
    * O(|tail|) however big the base grows, on every trigger. Merging
    * the tail is semantics-free: its epochs hold DISJOINT fingerprints
    * (each was admitted against all its predecessors) and no tombstone
    * applies to any of them (tombstones only kill epochs committed
    * before them). A no-op (tail shorter than 2 epochs) returns the
    * live version unchanged. Same crash-anywhere discipline as every
    * promotion.
    *
    * `coveredFloor`: checkpoint-watermark prune of the folded-name
    * list ([[graft.core.EpochStore.pruneCovered]]) — the streaming
    * loop passes its current batch id so covered.json stays O(1)
    * instead of growing with the whole batch history; safe because a
    * batch below the checkpoint frontier can never replay. */
  def compactTail(spark: SparkSession, root: String,
                  targetRows: Long = defaultCompactRowsPerPartition,
                  coveredFloor: Option[Long] = None): String =
    lockFor(root).synchronized {
      val token = currentToken(root)
      val eps = committedEpochs(root)
      val tail = eps.drop(tailStart(eps))
      if (tail.size < 2) graft.core.AtomicDir.current(root)
      else {
        def tbl(which: String): DataFrame =
          spark.read.parquet(tail.map(e => s"$root/$e/$which"): _*)
        val rejPaths = tail.filter(e => java.nio.file.Files.exists(
          java.nio.file.Paths.get(root, e, "rejections")))
        val rej =
          if (rejPaths.isEmpty) emptyRejections(spark)
          else spark.read
            .parquet(rejPaths.map(e => s"$root/$e/rejections"): _*)
            .groupBy("fp").agg(sum(col("n_rejected")).as("n_rejected"))
        val nCl = tbl("cliques").count() // O(|tail|), sizes the rewrite
        val name = "m" + java.util.UUID.randomUUID().toString.take(12)
        val covered = graft.core.EpochStore.pruneCovered(
          tail.flatMap(e =>
            graft.core.EpochStore.entryPath(e) +:
              graft.core.EpochStore.coveredNames(root, e)), coveredFloor)
        val ep = graft.core.EpochStore.writeEpoch(root, name, Seq(
          "cliques" -> ranged(tbl("cliques"), nCl, targetRows, 1,
            col("fp")),
          "sigs" -> ranged(tbl("sigs"), nCl, targetRows, 1,
            col("doc_id")),
          "bands" -> ranged(tbl("bands"), nCl, targetRows,
            numBands.toLong, col("band"), col("band_hash")),
          "rejections" -> rej), covered)
        promoteManifestCas(root, eps.take(tailStart(eps)) :+ ep, token)
      }
    }

  /** First manifest position of the mergeable accretion TAIL: after
    * the last tombstone, never the protected base (entry 0). */
  private def tailStart(eps: Seq[String]): Int =
    math.max(eps.lastIndexWhere(_.startsWith(TombPrefix)) + 1, 1)

  /** Explicit space reclamation — [[graft.core.EpochStore.gc]] over
    * this root: retired `v<N>` dirs, folded/orphaned epoch dirs,
    * stale staging leftovers. Run once no reader can hold an old
    * CURRENT pointer; rollback to prior versions is forfeited. */
  def gc(root: String): Int = graft.core.EpochStore.gc(root)

  /** Size of the accretion tail [[compactTail]] would merge — the
    * maintenance trigger the streaming ingests read, exposed here so
    * the tail-selection rule can never desynchronize from the
    * compaction itself. */
  def tailSize(root: String): Int = {
    val eps = committedEpochs(root)
    eps.size - tailStart(eps)
  }

  /** True when batch epoch `name` is accounted for by the live
    * manifest — committed directly or folded into a merged epoch by a
    * compaction. The replay-idempotency check for streaming callers. */
  def hasEpoch(root: String, name: String): Boolean =
    graft.core.EpochStore.isAccounted(root, s"epochs/$name")

  /** Corpus-wide VIRALITY from the index alone — per live distinct
    * content: its representative, the copies its admitting epoch saw
    * (`n_epoch_copies`) and the copies later batches exact-rejected
    * against it (`n_rejected_later`, off the per-epoch rejections
    * ledger), summing to the corpus-wide copy count `n_copies`. The
    * x186 gate pins this equal to a DIRECT md5 count over the whole
    * corpus — the refresh-equals-recompute proof that the ledger loses
    * nothing across epochs. Scale: two contracted-table scans and one
    * fp-keyed aggregate+join; the corpus text is never touched. */
  def virality(spark: SparkSession, root: String): DataFrame = {
    val idx = load(spark, root)
    val rej = loadRejections(spark, root)
      .groupBy("fp").agg(sum(col("n_rejected")).as("n_rej"))
    val later = coalesce(col("n_rej"), lit(0L))
    idx.cliques.join(rej, Seq("fp"), "left")
      .select(col("rep"), col("fp"),
        col("weight").as("n_epoch_copies"),
        later.as("n_rejected_later"),
        (col("weight") + later).as("n_copies"))
  }

  /** Ops inventory of the live manifest — one row per entry, in
    * manifest order: `(position, entry, kind, n_cliques, n_sigs,
    * n_bands, n_rejections, n_tombstones)` (counts NULL where a table
    * is absent). The first read an operator does before trusting,
    * compacting, or debugging an index: which epochs are live, how big
    * each is, where the tombstones sit. Driver-side row count ==
    * manifest length — never corpus-sized. */
  def stats(spark: SparkSession, root: String): DataFrame = {
    val rows = committedEpochs(root).zipWithIndex.map { case (e, i) =>
      val isTomb = e.startsWith(TombPrefix)
      val path = e.stripPrefix(TombPrefix)
      def cnt(t: String): Option[Long] = {
        val p = java.nio.file.Paths.get(root, path, t)
        if (java.nio.file.Files.exists(p))
          Some(spark.read.parquet(p.toString).count())
        else None
      }
      (i, path, if (isTomb) "tombstone" else "data",
        cnt("cliques"), cnt("sigs"), cnt("bands"), cnt("rejections"),
        cnt("tombstones"))
    }
    import spark.implicits._
    rows.toDF("position", "entry", "kind", "n_cliques", "n_sigs",
      "n_bands", "n_rejections", "n_tombstones")
  }

  // ---- DuckDB twin ---------------------------------------------------------

  /** Sig + band CTEs (prefixed `p`) for the reps of `repRel`, which
    * must produce (doc_id, text). */
  private def sigBandCtes(p: String, repRel: String): String = {
    val mins = minhashCoeffs.zipWithIndex
      .map { case ((a, b), i) =>
        s"min((${baseHashSql("sh")} * $a + $b) % $minhashPrime) AS m$i"
      }.mkString(", ")
    val bandHash = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS band_hash FROM ${p}_sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""${shinglesSqlCteN(shingleWords, repRel, s"${p}_sh")},
       |${p}_sig AS (SELECT doc_id, $mins FROM ${p}_sh GROUP BY doc_id),
       |${p}_bands AS (
       |  $bandHash
       |)""".stripMargin
  }

  /** Static oracle for the gate's 80/20 split (existing =
    * doc_id % 5 <> 0, incoming = the rest): the whole build+admit
    * replayed in SQL — the index is a deterministic function of the
    * existing partition, so the twin needs no dynamic state. */
  def admissionSql(minMatches: Int = defaultMinMatches): String =
    s"""$admissionCtes
       |SELECT i.doc_id, i.fp AS content_hash,
       |  CAST(i.weight AS BIGINT) AS n_batch_copies,
       |  CASE WHEN e.fp IS NOT NULL THEN 'dup_exact'
       |       WHEN b.best_matches >= $minMatches THEN 'dup_near'
       |       ELSE 'admitted' END AS verdict,
       |  CAST(coalesce(b.best_matches, 0) * $ppmPerMatch AS BIGINT)
       |    AS best_est_ppm
       |FROM ndx_in_cl i
       |LEFT JOIN ndx_ex_cl e USING (fp)
       |LEFT JOIN ndx_best b USING (doc_id)""".stripMargin

  /** DuckDB twin of [[admissionYield]] over the same 80/20 split. */
  def admissionYieldSql: String =
    s"""$admissionCtes
       |SELECT CAST(coalesce(b.best_matches, 0) AS BIGINT) AS best_matches,
       |  CAST(coalesce(b.best_matches, 0) * $ppmPerMatch AS BIGINT)
       |    AS est_ppm,
       |  CAST(count(*) AS BIGINT) AS n_contents,
       |  CAST(sum(i.weight) AS BIGINT) AS n_copies
       |FROM ndx_in_cl i
       |ANTI JOIN ndx_ex_cl e USING (fp)
       |LEFT JOIN ndx_best b USING (doc_id)
       |GROUP BY coalesce(b.best_matches, 0)""".stripMargin

  /** DuckDB twin of [[admissionAudit]] over the same 80/20 split. */
  def admissionAuditSql(minMatches: Int = defaultMinMatches,
                        threshold: Double = 0.5): String =
    s"""$admissionCtes,
       |ndx_pe AS (
       |  SELECT c.doc_id, c.old_rep, ($estSql) AS mc
       |  FROM ndx_cand c
       |  JOIN ndx_in_sig si ON si.doc_id = c.doc_id
       |  JOIN ndx_ex_sig se ON se.doc_id = c.old_rep
       |),
       |ndx_isz AS (SELECT doc_id, count(*) AS n FROM ndx_in_sh
       |  GROUP BY doc_id),
       |ndx_esz AS (SELECT doc_id, count(*) AS n FROM ndx_ex_sh
       |  GROUP BY doc_id),
       |ndx_int AS (
       |  SELECT p.doc_id, p.old_rep, count(*) AS ni
       |  FROM ndx_pe p
       |  JOIN ndx_in_sh a ON a.doc_id = p.doc_id
       |  JOIN ndx_ex_sh b ON b.doc_id = p.old_rep AND a.sh = b.sh
       |  GROUP BY p.doc_id, p.old_rep
       |),
       |ndx_mj AS (
       |  SELECT i.doc_id,
       |    max(CAST(i.ni AS DOUBLE) / (za.n + zb.n - i.ni)) AS mj
       |  FROM ndx_int i
       |  JOIN ndx_isz za ON za.doc_id = i.doc_id
       |  JOIN ndx_esz zb ON zb.doc_id = i.old_rep
       |  GROUP BY i.doc_id
       |),
       |ndx_mm AS (SELECT doc_id, max(mc) AS mm FROM ndx_pe GROUP BY doc_id)
       |SELECT CAST(CASE WHEN coalesce(m.mm, 0) >= $minMatches
       |    THEN 1 ELSE 0 END AS INTEGER) AS est_reject,
       |  CAST(CASE WHEN coalesce(j.mj, 0) >= $threshold
       |    THEN 1 ELSE 0 END AS INTEGER) AS exact_reject,
       |  CAST(count(*) AS BIGINT) AS n_contents,
       |  CAST(sum(i.weight) AS BIGINT) AS n_copies
       |FROM ndx_in_cl i
       |ANTI JOIN ndx_ex_cl e USING (fp)
       |LEFT JOIN ndx_mm m USING (doc_id)
       |LEFT JOIN ndx_mj j USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** The per-pair matching-component sum, shared by the probe CTEs. */
  private def estSql: String = (0 until numHashes)
    .map(i => s"CASE WHEN si.m$i = se.m$i THEN 1 ELSE 0 END")
    .mkString(" + ")

  /** DuckDB twin of [[virality]] over the gate's 80/20 fixture (index
    * built on the 80%, the 20% batch admitted as a second epoch). The
    * twin computes the DIRECT corpus-wide md5 count for every live
    * fingerprint — so the gate's hash equality against the Spark side's
    * ledger-accumulated numbers IS the proof that Σ weight + Σ rejected
    * reconstructs the corpus exactly. Live = the 80% cliques plus the
    * batch contents the admission actually admitted. */
  def viralitySql(minMatches: Int = defaultMinMatches): String =
    s"""$admissionCtes,
       |vir_adm AS (
       |  SELECT i.fp, i.doc_id AS rep, i.weight
       |  FROM ndx_in_cl i
       |  ANTI JOIN ndx_ex_cl e USING (fp)
       |  LEFT JOIN ndx_best b USING (doc_id)
       |  WHERE coalesce(b.best_matches, 0) < $minMatches
       |),
       |vir_live AS (
       |  SELECT fp, rep, weight FROM ndx_ex_cl
       |  UNION ALL
       |  SELECT fp, rep, weight FROM vir_adm
       |),
       |vir_all AS (
       |  SELECT md5(text) AS fp, count(*) AS copies
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id IS NOT NULL
       |  GROUP BY md5(text)
       |)
       |SELECT l.rep, l.fp,
       |  CAST(l.weight AS BIGINT) AS n_epoch_copies,
       |  CAST(a.copies - l.weight AS BIGINT) AS n_rejected_later,
       |  CAST(a.copies AS BIGINT) AS n_copies
       |FROM vir_live l JOIN vir_all a USING (fp)""".stripMargin

  /** DuckDB twin of [[admitGuarded]] over the same 80/20 split: hot
    * buckets drop out of the candidate CTE, and each incoming rep
    * carries the count of its own postings that hit them. */
  def admissionGuardedSql(maxBucket: Long,
                          minMatches: Int = defaultMinMatches): String =
    s"""$admissionCtes,
       |g_hot AS (
       |  SELECT band, band_hash FROM ndx_ex_bands
       |  GROUP BY band, band_hash HAVING count(*) > $maxBucket
       |),
       |g_cand AS (
       |  SELECT DISTINCT i.doc_id, e.doc_id AS old_rep
       |  FROM (SELECT b.* FROM ndx_in_bands b
       |        ANTI JOIN g_hot h USING (band, band_hash)) i
       |  JOIN ndx_ex_bands e
       |    ON i.band = e.band AND i.band_hash = e.band_hash
       |),
       |g_best AS (
       |  SELECT c.doc_id, max($estSql) AS best_matches
       |  FROM g_cand c
       |  JOIN ndx_in_sig si ON si.doc_id = c.doc_id
       |  JOIN ndx_ex_sig se ON se.doc_id = c.old_rep
       |  GROUP BY c.doc_id
       |),
       |g_nhot AS (
       |  SELECT i.doc_id, count(*) AS n_hot
       |  FROM ndx_in_bands i JOIN g_hot h USING (band, band_hash)
       |  GROUP BY i.doc_id
       |)
       |SELECT i.doc_id, i.fp AS content_hash,
       |  CAST(i.weight AS BIGINT) AS n_batch_copies,
       |  CASE WHEN e.fp IS NOT NULL THEN 'dup_exact'
       |       WHEN b.best_matches >= $minMatches THEN 'dup_near'
       |       ELSE 'admitted' END AS verdict,
       |  CAST(coalesce(b.best_matches, 0) * $ppmPerMatch AS BIGINT)
       |    AS best_est_ppm,
       |  CAST(coalesce(h.n_hot, 0) AS BIGINT) AS n_hot_buckets
       |FROM ndx_in_cl i
       |LEFT JOIN ndx_ex_cl e USING (fp)
       |LEFT JOIN g_best b USING (doc_id)
       |LEFT JOIN g_nhot h ON h.doc_id = i.doc_id""".stripMargin

  /** DuckDB twin of [[admit]] against an index that has RETRACTED
    * every clique whose representative satisfies `retractWhere` (a
    * predicate over the clique's `rep` doc_id): a tombstoned
    * fingerprint is absent for the exact tier (re-admittable) and its
    * rep's postings stop near-rejecting — so the oracle is simply
    * admission over the surviving cliques, everything (sigs, bands,
    * probe) flowing from the filtered clique relation. */
  def admissionSqlRetracted(retractWhere: String,
                            minMatches: Int = defaultMinMatches): String =
    s"""${admissionCtesWhere(retractWhere)}
       |SELECT i.doc_id, i.fp AS content_hash,
       |  CAST(i.weight AS BIGINT) AS n_batch_copies,
       |  CASE WHEN e.fp IS NOT NULL THEN 'dup_exact'
       |       WHEN b.best_matches >= $minMatches THEN 'dup_near'
       |       ELSE 'admitted' END AS verdict,
       |  CAST(coalesce(b.best_matches, 0) * $ppmPerMatch AS BIGINT)
       |    AS best_est_ppm
       |FROM ndx_in_cl i
       |LEFT JOIN ndx_ex_cl e USING (fp)
       |LEFT JOIN ndx_best b USING (doc_id)""".stripMargin

  /** Shared CTE prefix of the admission twins: clique/sig/band
    * relations for both partitions and the best-estimate probe.
    * `retractWhere`, when non-empty, drops the existing cliques whose
    * `rep` satisfies it (the tombstone twin — see
    * [[admissionSqlRetracted]]). */
  private def admissionCtes: String = admissionCtesWhere("")

  private def admissionCtesWhere(retractWhere: String): String = {
    val est = (0 until numHashes)
      .map(i => s"CASE WHEN si.m$i = se.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val exBase =
      """SELECT md5(text) AS fp, min(doc_id) AS rep, count(*) AS weight
        |  FROM documents
        |  WHERE doc_id % 5 <> 0 AND text IS NOT NULL AND doc_id IS NOT NULL
        |  GROUP BY md5(text)""".stripMargin
    val exCl =
      if (retractWhere.isEmpty) exBase
      else s"SELECT * FROM (\n  $exBase) WHERE NOT ($retractWhere)"
    s"""WITH ndx_ex_cl AS (
       |  $exCl
       |), ndx_in_cl AS (
       |  SELECT md5(text) AS fp, min(doc_id) AS doc_id, count(*) AS weight
       |  FROM documents
       |  WHERE doc_id % 5 = 0 AND text IS NOT NULL AND doc_id IS NOT NULL
       |  GROUP BY md5(text)
       |),
       |${sigBandCtes("ndx_ex",
          "(SELECT d.doc_id, d.text FROM documents d " +
            "JOIN ndx_ex_cl c ON d.doc_id = c.rep)")},
       |${sigBandCtes("ndx_in",
          "(SELECT d.doc_id, d.text FROM documents d " +
            "JOIN ndx_in_cl c ON d.doc_id = c.doc_id)")},
       |ndx_cand AS (
       |  SELECT DISTINCT i.doc_id, e.doc_id AS old_rep
       |  FROM ndx_in_bands i JOIN ndx_ex_bands e
       |    ON i.band = e.band AND i.band_hash = e.band_hash
       |), ndx_best AS (
       |  SELECT c.doc_id, max($est) AS best_matches
       |  FROM ndx_cand c
       |  JOIN ndx_in_sig si ON si.doc_id = c.doc_id
       |  JOIN ndx_ex_sig se ON se.doc_id = c.old_rep
       |  GROUP BY c.doc_id
       |)""".stripMargin
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.EpochStore

/** Epoch-sharded PERSISTED ANN ADMISSION INDEX — the embedding tier of
  * the four-tier admission stack under the SAME manifest lifecycle as
  * the text tiers ([[NearDupIndex]], [[SpanIndex]]): immutable postings
  * epochs named by a versioned manifest, O(|batch|) extension, tiered
  * tail compaction with a protected base, batch-replay idempotency
  * that survives compaction via `covered.json`
  * ([[graft.core.EpochStore]]).
  *
  * Relationship to the flat layout: [[IvfOps.saveIndex]] +
  * [[graft.streaming.AnnIndexStream]] maintain a single postings
  * directory through Spark's transactional file sink — exactly-once by
  * sink manifest, but compaction must close the ingest epoch and swap
  * the whole directory ([[graft.streaming.AnnIndexStream.compactIndex]]).
  * This index instead gives the embedding tier the text tiers'
  * epoch-manifest discipline, which a FOUR-TIER streaming admitter
  * needs: per micro-batch, one `b<id>`-named epoch per index, one
  * shared replay rule, and maintenance that never rewrites the base.
  *
  * What persists:
  *   - `root/centroids` — the frozen coarse quantizer (model identity
  *     is what makes accumulated postings valid: a re-train swaps the
  *     whole root, never splices — the [[IvfOps.saveIndex]] rule);
  *   - `root/epochs/<name>/postings` (vec_id, centroid_id, qcode) —
  *     int8-coded vectors under the frozen model, the
  *     [[graft.streaming.AnnIndexStream.postings]] arithmetic
  *     (bit-exact with the offline builder).
  *
  * Admission ([[admit]]) is [[IvfOps.admitVectorsOver]] against the
  * live epoch union: per incoming vector, its best ADC neighbor among
  * the probed inverted lists, `dup_embed` at `tauMicro` — the
  * incremental SemDeDup decision; indexed floats are never re-read.
  * Extension posts ONLY vectors the live index admitted (the
  * contraction discipline: a semantic duplicate's anchor already
  * covers it; in-batch semantic dups both post, exactly as in-batch
  * near-dups both post in [[NearDupIndex]] — the batch is admitted
  * first, indexed second).
  *
  * Scale shape: probes broadcast into nProbe lists per query
  * (index-side bytes never shuffle); extension is O(|admitted batch|);
  * [[compactTail]] merges only the accretion tail, range-bucketed by
  * (centroid_id, vec_id) so each output file serves whole list ranges
  * with a tight centroid_id min/max — parallel rewrite, no
  * corpus-sized task. */
object AnnAdmitIndex {

  val defaultCompactRowsPerPartition: Long =
    NearDupIndex.defaultCompactRowsPerPartition

  private def lockFor(root: String) = EpochStore.lockFor(root)

  def committedEpochs(root: String): Seq[String] =
    EpochStore.committedEpochs(root)

  /** The frozen coarse quantizer of the index at `root`. */
  def loadModel(spark: SparkSession, root: String): IvfOps.IvfModel = {
    val rows = spark.read.parquet(s"$root/centroids")
      .orderBy("centroid_id").collect()
    IvfOps.IvfModel(rows.map(
      _.getAs[scala.collection.Seq[Double]]("cv").toArray))
  }

  /** The live postings relation `(vec_id, centroid_id, qcode)`. */
  private def load(spark: SparkSession, root: String): DataFrame = {
    val eps = committedEpochs(root)
    require(eps.nonEmpty, s"empty ANN admission index at $root")
    spark.read.parquet(eps.map(e => s"$root/$e/postings"): _*)
  }

  /** Build and promote the initial index over `emb` `(vec_id,
    * embedding)` under `model` (frozen from this point on). Returns
    * the promoted version path. */
  def buildIndex(emb: DataFrame, model: IvfOps.IvfModel,
                 root: String): String =
    lockFor(root).synchronized {
      val token = EpochStore.currentToken(root)
      IvfOps.saveCentroids(emb.sparkSession, model, root)
      val ep = EpochStore.writeEpoch(root,
        "e" + java.util.UUID.randomUUID().toString.take(12),
        Seq("postings" -> graft.streaming.AnnIndexStream
          .postings(emb, model)))
      EpochStore.promoteCas(root, Seq(ep), token)
    }

  /** Admission verdicts for an embedding batch against the LIVE index:
    * `(vec_id, anchor_id, adc_cos_micro, verdict)` with verdict ∈
    * {admitted, dup_embed} — [[IvfOps.admitVectors]]' schema. */
  def admit(queries: DataFrame, root: String, tauMicro: Long,
            nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    IvfOps.admitVectorsOver(loadModel(spark, root), load(spark, root),
      queries, tauMicro, nProbe)
  }

  /** Commit the batch's ADMITTED vectors as a new epoch under a
    * caller-chosen name — the idempotent-replay form shared with the
    * text tiers: a name already accounted for (committed or folded by
    * a compaction) is a completed batch, returns false untouched; a
    * crashed half-written attempt rebuilds deterministically from the
    * COMMITTED manifest. */
  def extendEpoch(emb: DataFrame, root: String, epochName: String,
                  tauMicro: Long, nProbe: Int): Boolean =
    lockFor(root).synchronized {
      EpochStore.requireSafeEpochName(epochName)
      val token = EpochStore.currentToken(root)
      val committed = committedEpochs(root)
      if (hasEpoch(root, epochName)) false
      else {
        val spark = emb.sparkSession
        val model = loadModel(spark, root)
        val admitted = emb.join(
          admit(emb, root, tauMicro, nProbe)
            .filter(col("verdict") === "admitted").select(col("vec_id")),
          Seq("vec_id"), "left_semi")
        val ep = EpochStore.writeEpoch(root, epochName,
          Seq("postings" -> graft.streaming.AnnIndexStream
            .postings(admitted, model)))
        EpochStore.promoteCas(root, committed :+ ep, token)
        true
      }
    }

  /** Range-bucket postings by (centroid_id, vec_id): parallel rewrite,
    * per-file centroid_id min/max for list-probe pruning. */
  private def ranged(posts: DataFrame, rows: Long,
                     target: Long): DataFrame = {
    val n = math.max(1L, (rows + target - 1) / target)
      .min(Int.MaxValue.toLong).toInt
    posts.repartitionByRange(n, col("centroid_id"), col("vec_id"))
      .sortWithinPartitions("centroid_id", "vec_id")
  }

  /** Rewrite the committed epochs as ONE range-bucketed epoch
    * (`dropVecIds` filters retracted vectors out on the way — the
    * takedown path, kill set broadcast into an anti-join). Folded
    * names persist in `covered.json`. Returns the promoted version
    * path. */
  def compact(spark: SparkSession, root: String,
              targetRows: Long = defaultCompactRowsPerPartition,
              dropVecIds: Option[DataFrame] = None): String =
    lockFor(root).synchronized {
      val token = EpochStore.currentToken(root)
      val eps = committedEpochs(root)
      val all = load(spark, root)
      val kept = dropVecIds.fold(all)(kill => all.join(
        broadcast(kill.select(col("vec_id").cast("long")).distinct()),
        Seq("vec_id"), "left_anti"))
      val covered = eps.flatMap(e =>
        EpochStore.entryPath(e) +: EpochStore.coveredNames(root, e))
      val ep = EpochStore.writeEpoch(root,
        "c" + java.util.UUID.randomUUID().toString.take(12),
        Seq("postings" -> ranged(kept, kept.count(), targetRows)), covered)
      EpochStore.promoteCas(root, Seq(ep), token)
    }

  /** TIERED (tail) compaction — merge the accretion tail (every epoch
    * after the protected first/base entry) into one range-bucketed
    * epoch, leaving the base untouched on disk: O(|tail|) however big
    * the base grows, the [[NearDupIndex.compactTail]] discipline.
    * Semantics-free: epochs hold disjoint vec_ids (each batch posted
    * only its own admitted vectors) and the probe is a plain union.
    * A <2-epoch tail is a promoted-version no-op. */
  def compactTail(spark: SparkSession, root: String,
                  targetRows: Long = defaultCompactRowsPerPartition): String =
    lockFor(root).synchronized {
      val token = EpochStore.currentToken(root)
      val eps = committedEpochs(root)
      val tail = eps.drop(1)
      if (tail.size < 2) graft.core.AtomicDir.current(root)
      else {
        val merged = spark.read
          .parquet(tail.map(e => s"$root/$e/postings"): _*)
        val covered = tail.flatMap(e =>
          EpochStore.entryPath(e) +: EpochStore.coveredNames(root, e))
        val ep = EpochStore.writeEpoch(root,
          "m" + java.util.UUID.randomUUID().toString.take(12),
          Seq("postings" -> ranged(merged, merged.count(), targetRows)),
          covered)
        EpochStore.promoteCas(root, Seq(eps.head, ep), token)
      }
    }

  /** Size of the accretion tail [[compactTail]] would merge. */
  def tailSize(root: String): Int =
    math.max(committedEpochs(root).size - 1, 0)

  /** True when batch epoch `name` is accounted for by the live
    * manifest — committed directly or folded by a compaction. */
  def hasEpoch(root: String, name: String): Boolean =
    EpochStore.isAccounted(root, s"epochs/$name")

  /** Ops inventory: one row per epoch in manifest order. */
  def stats(spark: SparkSession, root: String): DataFrame = {
    val rows = committedEpochs(root).zipWithIndex.map { case (e, i) =>
      (i, e, spark.read.parquet(s"$root/$e/postings").count())
    }
    import spark.implicits._
    rows.toDF("position", "entry", "n_postings")
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{IvfOps, SimilarityOps}

/** Incremental ANN index maintenance — the online half of the persisted
  * IVF index contract ([[IvfOps.saveIndex]] / [[IvfOps.adcTopKFromIndex]]):
  * embeddings arriving on a stream are assigned to their inverted list
  * and int8-coded AS THEY ARRIVE, appended to the postings table under
  * the frozen coarse quantizer. Queries keep probing the same postings
  * path and see new vectors at micro-batch latency; the float corpus is
  * never re-read.
  *
  * WHICH LAYOUT WHEN (the embedding tier ships two): this FLAT layout
  * serves the QUERY path — a topK/ADC index fed by a raw embedding
  * stream, where the transactional file sink's `_spark_metadata`
  * gives exactly-once without a foreachBatch and compaction is an
  * offline epoch-close ([[compactIndex]]'s directory swap). The
  * ADMISSION tier of the four-tier ingest loop is served by
  * [[graft.operators.AnnAdmitIndex]] — the epoch-manifest layout —
  * and that is the production path for admission: per-micro-batch
  * `b<id>` epochs under the text tiers' shared replay rule,
  * covered.json idempotency across compactions, protected-base tail
  * maintenance, and [[graft.operators.AnnAdmitIndex.retrain]] (the
  * quantizer re-train this layout's whole-directory swap can only do
  * as a full offline rebuild). New admission surfaces should build on
  * AnnAdmitIndex; this sink stays for x192-style query-serving
  * deployments.
  *
  * Shape: one stateless per-row map (broadcast K×dim centroids — no
  * join, no window, no state store), then Spark's transactional file
  * sink — the `_spark_metadata` manifest gives exactly-once file
  * semantics across restarts, so a replayed micro-batch can't duplicate
  * postings. Re-training the quantizer (when [[IvfOps.clusterStats]]
  * says the codebook stopped fitting) is an offline rebuild by design:
  * centroid identity is what makes the accumulated postings valid, so a
  * model swap must swap the whole index directory, never splice.
  *
  * Arithmetic parity with the offline builder is bit-exact: the same
  * [[IvfOps.IvfModel.nearest]] assignment and the same
  * `floor(x / norm * 127 + 0.5)` code op-order as
  * [[SimilarityOps.quantizeEmbeddings]] — AnnIndexStreamSpec pins
  * stream-built == offline-rebuilt postings AND probe-result equality. */
object AnnIndexStream {

  /** `(vec_id, centroid_id, qcode)` posting rows for a batch OR
    * streaming embedding relation under a frozen model — one stateless
    * mapper, everything computed per row. */
  def postings(emb: DataFrame, model: IvfOps.IvfModel): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val n = math.sqrt(SimilarityOps.dotLocal(v, v))
        val q =
          if (n == 0) v.map(_ => 0)
          else v.map(x => math.floor(x / n * 127d + 0.5d).toInt)
        (id, bc.value.nearest(v, 1).head, q)
      }
      .toDF("vec_id", "centroid_id", "qcode")
  }

  /** Maintain the postings of the index at `dir` from a streaming
    * embedding source. `dir/centroids` must already hold the frozen
    * model ([[IvfOps.saveCentroids]]). */
  def ingest(stream: DataFrame, model: IvfOps.IvfModel, dir: String,
             checkpointDir: String): StreamingQuery =
    postings(stream, model).writeStream
      .format("parquet")
      .option("path", s"$dir/postings")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Size-triggered compaction of accumulated micro-batch postings.
    *
    * Every micro-batch appends at least one parquet file per partition,
    * so a long-lived ingest accretes thousands of tiny files — each
    * probe then pays file-open latency instead of scan throughput. This
    * rewrites the postings CLUSTERED BY INVERTED LIST into at most
    * `ceil(listRows / targetRowsPerFile)` files per list: a probe of
    * one list touches one file group, the layout a production IVF
    * deployment wants (the [[IvfOps.saveIndex]] doc's "bucket postings
    * by centroid_id").
    *
    * Mechanics: rows are read through the sink's `_spark_metadata`
    * manifest (committed files only — an in-flight batch can't leak
    * in), get exact per-list ranks from [[graft.operators.TwoPhase]]
    * (deterministic vec_id-range buckets — no list-sized sort task, the
    * x126 discipline), and file ids `rank div target`. The shuffle keys
    * on (centroid_id, file_id), so each output file holds whole
    * (list, file) groups — a list never spreads past its quota.
    *
    * Lifecycle (the model-swap discipline): compaction writes a NEW
    * index dir — `newDir/centroids` copied from the frozen model,
    * `newDir/postings` plain parquet — and [[promoteIndex]] promotes it.
    * The streaming manifest CANNOT adopt foreign files (a restarted
    * sink's `_spark_metadata` would hide them from manifest-aware
    * reads), so compaction closes an ingest EPOCH: stop the query,
    * compact, swap, then resume ingest with a fresh checkpoint into a
    * fresh postings dir and treat the compacted files as that epoch's
    * base — exactly how a quantizer re-train already swaps the whole
    * directory, never splicing. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                   newDir: String, targetRowsPerFile: Long,
                   buckets: Int = 64,
                   dropVecIds: Option[DataFrame] = None): Unit = {
    require(targetRowsPerFile >= 1, s"targetRowsPerFile=$targetRowsPerFile")
    spark.read.parquet(s"$dir/centroids").repartition(1)
      .write.mode("errorifexists").parquet(s"$newDir/centroids")
    val all = spark.read.parquet(s"$dir/postings")
    val posts = dropVecIds.fold(all)(kill => all.join(
      broadcast(kill.select(col("vec_id").cast("long")).distinct()),
      Seq("vec_id"), "left_anti"))
    val st = posts.agg(min(col("vec_id")).as("v0"), max(col("vec_id")).as("v1"))
    val ranked = graft.operators.TwoPhase.prefixed(
      posts.crossJoin(broadcast(st)),
      partCols = Seq("centroid_id"),
      bucketCol = graft.operators.TwoPhase.equiWidthBucketSql(
        "vec_id", "v0", "v1", buckets),
      orderCols = Seq(col("vec_id")),
      sums = Seq("rn" -> lit(1L)), totals = false)
      .withColumn("file_id", expr(s"(rn_pre - 1L) div ${targetRowsPerFile}L"))
      .select(col("vec_id"), col("centroid_id"), col("qcode"),
        col("file_id"))
    ranked
      .repartition(col("centroid_id"), col("file_id"))
      .sortWithinPartitions("centroid_id", "vec_id")
      .drop("file_id")
      .write.mode("errorifexists").parquet(s"$newDir/postings")
  }

  /** Resolve the live index version under `root` via the `CURRENT`
    * pointer — the path readers open at query start. */
  def currentIndexDir(root: String): String =
    graft.core.AtomicDir.current(root)

  /** Promote a compacted (or re-trained) index under `root`.
    *
    * The earlier two-rename swap (live→retired, new→live) had a hole:
    * each rename is atomic but the PAIR is not — a crash or a reader
    * resolving between them finds no live directory at all. Promotion
    * is therefore versioned-dir + pointer: `newDir` moves into `root`
    * as `v<N>` (atomic same-fs rename, invisible to readers — nothing
    * points at it yet), then the `CURRENT` pointer file is rewritten
    * via write-temp + ATOMIC_MOVE. The live name always resolves: a
    * reader sees the old pointer (its version dir is never touched by
    * promotion) or the new one, never an absent or half-written state,
    * and a crash at any instant leaves a fully consistent root. Prior
    * versions stay in place for rollback/audit (re-promote by
    * rewriting `CURRENT`); retire them with an explicit delete once
    * no reader can still hold the old pointer. Returns the promoted
    * version path.
    *
    * Only COMPACTED (plain-parquet) index dirs promote: a live
    * streaming-sink epoch cannot be moved at all — its
    * `_spark_metadata` manifest pins absolute file paths, so a renamed
    * sink dir stops reading (this also invalidated the retired dir
    * under the old two-rename swap). [[compactIndex]] closes the epoch
    * first; the sink dir stays where it was born. */
  def promoteIndex(root: String, newDir: String): String =
    graft.core.AtomicDir.promote(root, newDir)

  /** VECTOR RETRACTION — the ANN-index half of the takedown path
    * ([[graft.operators.NearDupIndex.retract]] is the signature-index
    * half): rewrite the index WITHOUT the named vectors and promote the
    * result. Retraction is deliberately a filtered [[compactIndex]] —
    * the postings layout invariants (whole (list, file) groups, exact
    * per-list file quotas) must hold on the survivor set anyway, and a
    * takedown that re-files the lists costs one postings rewrite either
    * way; the kill set (takedowns are small by nature) broadcasts into
    * an anti-join ahead of the ranking, so dropped vectors never reach
    * the shuffle. Queries probing through [[currentIndexDir]] stop
    * seeing the vectors at promotion, atomically; prior versions keep
    * them for rollback/audit until explicitly retired. */
  def retractIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                   newDir: String, vecIds: DataFrame,
                   targetRowsPerFile: Long, buckets: Int = 64): Unit =
    compactIndex(spark, dir, newDir, targetRowsPerFile, buckets,
      dropVecIds = Some(vecIds))
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup on ingest — the first dedup line of a corpus
  * pipeline: duplicates arriving within the watermark horizon of each
  * other are suppressed at the door, so downstream storage and the
  * offline near-dup sweeps (LSH/simhash) see each near-window burst of
  * copies once.
  *
  * Keyed by content hash via `dropDuplicatesWithinWatermark`: unlike a
  * streaming `dropDuplicates` (whose key state can never be evicted —
  * unbounded on an infinite corpus), the within-watermark form drops
  * state once the event-time watermark passes a key's horizon, so state
  * is O(arrival rate × watermark), independent of stream age. The cost
  * of that bound is long-range duplicates (re-crawls months apart) —
  * exactly what the batch dedup passes catch offline; the two compose
  * into the standard online-suppress + offline-sweep architecture.
  */
object DedupStream {

  /** `docs` must carry an event-time column `ts` (ingest or crawl time)
    * plus `text`; emits each distinct text once per watermark horizon,
    * earliest arrival wins within a micro-batch. */
  def dedupOnIngest(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming decontamination guard: flag (don't drop — curation wants
    * the audit trail) arriving documents that share any n-gram shingle
    * with a static eval/benchmark set, probed through a broadcast Bloom
    * filter of the eval shingles' hashes — the online twin of
    * [[graft.operators.DedupOps.bloomContaminationReport]]'s pre-filter.
    * Stateless per row (no watermark state), so it composes before
    * [[dedupOnIngest]] in the same query. The sketch errs on the side
    * of flagging (false positives only, at the filter's fpp); flagged
    * docs route to the exact offline check.
    *
    * `bloom` comes from the offline build (the same
    * `df.stat.bloomFilter` the batch path trains) — pass it in rather
    * than deriving it here so one sketch serves every executor of every
    * micro-batch via one broadcast. `n` MUST match the shingle width
    * the sketch was built with (a mismatch probes n-grams the filter
    * never saw and silently flags almost nothing); the default equals
    * [[graft.operators.DedupOps.bloomContaminationReport]]'s. */
  def flagContaminated(docs: DataFrame,
                       bloom: org.apache.spark.util.sketch.BloomFilter,
                       n: Int = 5): DataFrame = {
    // shingle hashes AND the sketch probe are builtin/native codegen'd
    // expressions — the probe is Spark's own BloomFilterMightContain
    // applied per element inside the exists() lambda (zero udf sites)
    docs.withColumn("contaminated",
      coalesce(exists(transform(
        array_distinct(graft.operators.DedupOps.shingles(col("text"), n)),
        sh => graft.functions.HashFunctions.hash60(sh)),
        h => graft.functions.BloomFunctions.mightContain(bloom, h)),
        lit(false)))
  }
}

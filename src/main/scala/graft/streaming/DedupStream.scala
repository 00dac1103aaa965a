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
}

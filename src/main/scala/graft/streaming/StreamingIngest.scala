package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DecimalType, StructType}

import graft.core.StateStore
import graft.operators.MergeOps

/** Structured-Streaming front end for the ingest dataflow (SURVEY §2.9).
  *
  * The reference's server is a polling loop with hybrid time/size flush
  * triggers (flush every 5 s or when a queue fills —
  * `Server/__init__.py:297-325`, `config.json:24-29`). The Spark-native
  * equivalent: staged scrape rows land as parquet drops in a staging
  * directory; a streaming query micro-batches them
  * (`Trigger.ProcessingTime(5s)` = the time trigger, `maxFilesPerTrigger`
  * = the size cap) and `foreachBatch` runs the same M1/M2 merge rounds the
  * batch pipeline uses. Backpressure is inherent — one batch in flight.
  *
  * Exactly-once: the merge keys are idempotent (same posture as the
  * reference's ON CONFLICT DO NOTHING), so replayed batches after a crash
  * converge to the same state; the checkpoint dir gives at-least-once
  * delivery of every staged file.
  */
object StreamingIngest {

  /** Schema of staged scrape drops (one parquet file per crawl flush):
    * matches `FsScrape.ScrapeRecord`. */
  val stageSchema: StructType = org.apache.spark.sql.Encoders
    .product[graft.sources.FsScrape.ScrapeRecord].schema

  /** Start the merge stream over a staging directory. Each micro-batch:
    * M2 dir upsert → M1 file upsert keyed through the refreshed dir ids.
    * `asOfOverride` pins batch timestamps for deterministic tests. */
  def start(state: StateStore, stageDir: String, checkpointDir: String,
            triggerMs: Long = 5000, maxFilesPerTrigger: Int = 100,
            asOfOverride: Option[Timestamp] = None): StreamingQuery = {
    val spark = state.spark
    val stream = spark.readStream
      .schema(stageSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stageDir)

    stream.writeStream
      .queryName("graft-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(state, batch,
          asOfOverride.getOrElse(new Timestamp(System.currentTimeMillis())))
      }
      .start()
  }

  /** One micro-batch merge round (shared with tests; pure batch logic). */
  def mergeBatch(state: StateStore, batch: DataFrame, asOf: Timestamp): Unit = {
    if (batch.isEmpty) return
    val dirs = batch.filter(col("kind") === "dir").select(
        col("fullPath").as("dir_path"), col("ctime"), col("mtime"))
      .unionByName(batch.filter(col("kind") === "self").select(
        col("fullPath").as("dir_path"), col("ctime"), col("mtime")))
      .dropDuplicates("dir_path")
    state.write("directory",
      MergeOps.upsertDirs(state.read("directory"), dirs, asOf))

    val dirIds = state.read("directory").select(col("id").as("dir_id"), col("dir_path"))
    val files = batch.filter(col("kind") === "file").select(
        col("name"), col("dirPath").as("dir_path"),
        col("sizeMb").cast(DecimalType(18, 6)).as("size"),
        col("ctime"), col("mtime"), col("atime"))
      .join(dirIds, Seq("dir_path")).drop("dir_path")
    state.write("file",
      MergeOps.upsertFiles(state.read("file"), files, asOf))
  }
}

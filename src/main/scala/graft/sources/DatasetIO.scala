package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset ingestion and sharded output for the documents corpus — the
  * I/O halves a training-data pipeline actually runs: JSONL in (the
  * lingua franca of text corpora; gzip/zstd handled by Spark's codec
  * inference), partitioned parquet out.
  *
  * Malformed input never kills the job and never silently disappears:
  * lines are read as text and parsed with `from_json`, which yields NULL
  * on parse failure — so valid rows and rejects split cleanly without
  * the `_corrupt_record` caching quirk of schema'd `spark.read.json`
  * (SPARK-21610: filtering the corrupt-record column alone raises an
  * AnalysisException unless the frame is cached). Rejects carry the raw
  * line for quarantine.
  *
  * Scale: text read is splittable per file (and per block for
  * uncompressed/zstd-seekable inputs); parsing is a narrow codegen'd
  * projection; the writer bounds file sizes with `maxRecordsPerFile` so
  * shards stay uniform regardless of upstream partitioning.
  */
object DatasetIO {

  /** The documents table contract (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Single-pass batch parse of a JSONL corpus: one frame with an
    * `is_valid` flag, the raw line, and the parsed fields — the same
    * shape as [[streamDocumentsJsonl]]. One scan covers both routing
    * decisions; use this form when materializing valid rows AND rejects
    * in the same job (the pair form below scans once per output). */
  def readDocumentsJsonlFlagged(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("value").as("raw_line"),
        from_json(col("value"), documentsSchema).as("d"))
      .withColumn("is_valid",
        col("d").isNotNull && col("d.doc_id").isNotNull && col("d.text").isNotNull)
      .select(col("is_valid"), col("raw_line"), col("d.*"))

  /** Parse a JSONL corpus into `(valid, rejects)`: valid rows match
    * [[documentsSchema]] with a non-null doc_id and text; rejects keep
    * the raw line. Each output is an independent lineage (materializing
    * both scans the input twice) — prefer [[readDocumentsJsonlFlagged]]
    * for one-scan routing. */
  def readDocumentsJsonl(spark: SparkSession,
                         path: String): (DataFrame, DataFrame) = {
    val flagged = readDocumentsJsonlFlagged(spark, path)
    (flagged.filter(col("is_valid"))
       .select(documentsSchema.fieldNames.map(col).toIndexedSeq: _*),
     flagged.filter(!col("is_valid")).select(col("raw_line")))
  }

  /** Streaming twin of [[readDocumentsJsonl]] for corpora that arrive
    * continuously: the same text + `from_json` parse over a file-source
    * stream. A streaming query cannot fork into two sinks, so this
    * returns one frame with an `is_valid` flag and the raw line — route
    * valid rows onward and quarantine the rest inside one `foreachBatch`
    * (or run two filtered writeStreams over it). */
  def streamDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(path)
      .select(col("value").as("raw_line"),
        from_json(col("value"), documentsSchema).as("d"))
      .withColumn("is_valid",
        col("d").isNotNull && col("d.doc_id").isNotNull && col("d.text").isNotNull)
      .select(col("is_valid"), col("raw_line"), col("d.*"))

  /** Single-pass flagged CSV parse (header row, quoted fields). The
    * `is_valid` projection references the data columns alongside the
    * corrupt-record column, so it dodges SPARK-21610 (a filter on the
    * corrupt column ALONE is rejected unless cached) without the cached
    * frame the previous workaround leaked. */
  def readDocumentsCsvFlagged(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .schema(documentsSchema.add("_corrupt_record", StringType))
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .select(
        ((col("_corrupt_record").isNull &&
          col("doc_id").isNotNull && col("text").isNotNull).as("is_valid") +:
          coalesce(col("_corrupt_record"), col("text"), lit("")).as("raw_line") +:
          documentsSchema.fieldNames.toIndexedSeq.map(col)): _*)

  /** CSV variant of [[readDocumentsJsonl]]. Same validity contract; same
    * one-lineage-per-output caveat. */
  def readDocumentsCsv(spark: SparkSession,
                       path: String): (DataFrame, DataFrame) = {
    val flagged = readDocumentsCsvFlagged(spark, path)
    (flagged.filter(col("is_valid"))
       .select(documentsSchema.fieldNames.map(col).toIndexedSeq: _*),
     flagged.filter(!col("is_valid")).select(col("raw_line")))
  }

  /** Write a corpus as partitioned parquet with bounded shard sizes:
    * `dir/<col>=<value>/part-*.parquet`, each file capped at
    * `maxRecordsPerFile` rows — uniform shards whatever the upstream
    * partitioning did. */
  def writeShards(df: DataFrame, dir: String, partitionCols: Seq[String],
                  maxRecordsPerFile: Long = 1000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** ORC twin of [[writeShards]] — same bounded-shard partitioned
    * layout on the other mainstream columnar format (some lakes
    * standardize on ORC; Spark's reader gives it the same pushdown and
    * pruning as parquet, `OrcIOSpec` pins PushedFilters in the plan). */
  def writeShardsOrc(df: DataFrame, dir: String, partitionCols: Seq[String],
                     maxRecordsPerFile: Long = 1000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .orc(dir)

  def readOrc(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)

  /** Write a table bucketed (and sorted) by a join key — the co-located
    * join layout for the hot keys of a 100 TB corpus: two tables
    * bucketed by the same key with the same bucket count equi-join with
    * NO Exchange on either side (the bucketing IS the shuffle, paid once
    * at write time and amortized over every subsequent join/groupBy on
    * that key). `BucketedJoinSpec` pins the exchange-free plan.
    *
    * Spark bucketing rides the table catalog, so this registers `name`
    * (external table at `path`); read it back with `spark.table(name)`.
    * Pick `buckets` so each bucket file lands near the target partition
    * size at scale (corpus size / buckets ≈ 128–512 MB). */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    bucketCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(name)
}

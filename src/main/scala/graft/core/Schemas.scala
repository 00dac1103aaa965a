package graft.core

import org.apache.spark.sql.types._

/** Normative schemas for the engine's state tables (SURVEY §1.3;
  * reference DDL at `FileDbDAL/Directory.py:90-101`, `File.py:114-128`,
  * `Hash.py:61-72`, `DirectoryCrawl.py:512-562`). */
object Schemas {

  val directory: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("dir_path", StringType, nullable = false),
    StructField("ctime", TimestampType),
    StructField("mtime", TimestampType),
    StructField("inserted_on", TimestampType),
    StructField("updated_on", TimestampType)))

  val file: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType, nullable = false),
    StructField("dir_id", LongType, nullable = false),
    StructField("size", DecimalType(18, 6)),
    StructField("ctime", TimestampType),
    StructField("mtime", TimestampType),
    StructField("atime", TimestampType),
    StructField("inserted_on", TimestampType),
    StructField("updated_on", TimestampType)))

  val hash: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("file_id", LongType, nullable = false),
    StructField("md5_hash", StringType),
    StructField("md5_hash_time", TimestampType),
    StructField("sha1_hash", StringType),
    StructField("sha1_hash_time", TimestampType)))

  val drive: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("dir_path", StringType, nullable = false),
    StructField("inserted_on", TimestampType)))

  val directoryControl: StructType = StructType(Seq(
    StructField("dir_path", StringType, nullable = false),
    StructField("dir_id", LongType),
    StructField("file_count", IntegerType),
    StructField("subdir_count", IntegerType),
    StructField("next_crawl", TimestampType),
    StructField("crawl_frequency", LongType),
    StructField("assigned_process_id", IntegerType),
    StructField("process_assigned_on", TimestampType),
    StructField("last_crawled", TimestampType),
    StructField("last_active", TimestampType),
    StructField("dir_missing", BooleanType),
    StructField("inserted_on", TimestampType)))

  val hashControl: StructType = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("mtime", TimestampType),
    StructField("file_size", DecimalType(18, 6)),
    StructField("process_assigned_on", TimestampType),
    StructField("file_missing", BooleanType),
    StructField("inserted_on", TimestampType)))

  val fileArchive: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("dir_id", LongType),
    StructField("size", DecimalType(18, 6)),
    StructField("ctime", TimestampType),
    StructField("mtime", TimestampType),
    StructField("atime", TimestampType),
    StructField("original_inserted_on", TimestampType),
    StructField("original_updated_on", TimestampType),
    StructField("deleted_on", TimestampType)))

  val directoryArchive: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("dir_path", StringType),
    StructField("ctime", TimestampType),
    StructField("mtime", TimestampType),
    StructField("original_inserted_on", TimestampType),
    StructField("original_updated_on", TimestampType),
    StructField("deleted_on", TimestampType)))

  val all: Map[String, StructType] = Map(
    "directory" -> directory, "file" -> file, "hash" -> hash,
    "drive" -> drive, "directory_control" -> directoryControl,
    "hash_control" -> hashControl, "file_archive" -> fileArchive,
    "directory_archive" -> directoryArchive)
}

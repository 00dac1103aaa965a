package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-provided testdata plus the derived filesystem
  * catalog.
  *
  * The reference engine's query surface (views, searches, duplicate
  * detection, scheduling — see SURVEY.md §2) runs over `directory`,
  * `file`, `hash`, `file_category`, `directory_control`, `hash_control`
  * tables (schemas: `FileDbDAL/Directory.py:90-101`, `File.py:114-128`,
  * `Hash.py:61-72`, `DirectoryCrawl.py:512-562`). The driver's testdata is
  * TPC-H-ish, so [[FsCatalog]] derives a deterministic filesystem catalog
  * from it; `graft.oracle.Oracle.catalogCte` mirrors the exact same
  * construction in DuckDB SQL, making every catalog query
  * oracle-checkable.
  *
  * Scale note: all derivations are narrow projections + broadcastable
  * dimension joins (region/nation are tiny, customer is a dimension); at
  * 100 TB the only big input is `orders`, which flows through map-side
  * only (no shuffle is introduced here).
  */
object Tables {
  private val T0 = "2024-01-01 00:00:00"

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** Historically `events.ts` was nanosecond-precision, which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]); newer generations
    * write native µs timestamps. Handle both: read nanos as raw longs
    * and truncate to a µs timestamp, pass a native timestamp through
    * unchanged. Oracle queries never project raw `ts`, and every derived
    * value (hour truncation, epoch seconds) is unaffected by the ns→µs
    * floor. */
  def events(spark: SparkSession, d: String): DataFrame = {
    // NOTE: reader-functions mutating session confs is a smell, but both
    // flags below are prerequisites of a correct read, not preferences:
    // nanosAsLong is the only way Spark opens a ns-precision file at
    // all, and a UTC session is what makes the NTZ→LTZ cast wall-clock
    // preserving. Entry points (Verify/Bench/specs) already run UTC;
    // setting it here makes the contract hold for ANY caller instead of
    // silently shifting every derived epoch under a non-UTC session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // keep the historical LTZ type every consumer was verified on
        // (unix_micros etc. reject NTZ); the UTC session set above makes
        // the cast preserve the wall-clock reading
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => raw
      case other => throw new IllegalArgumentException(
        s"events.ts has unexpected physical type $other — the testdata " +
          "schema drifted again (ns-BIGINT in rounds 1-7, µs-NTZ in round " +
          "8); extend Tables.events deliberately instead of passing it through")
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  private def t0 = lit(java.sql.Timestamp.valueOf(T0))

  /** Derived filesystem catalog. Keep in sync with
    * `graft.oracle.Oracle.catalogCte` — the DuckDB twin. */
  object FsCatalog {

    /** `directory`: region roots (id 100+rk), nation dirs (200+nk), and an
      * `archive` subdir per nation (300+nk). All paths are nix-style. */
    def directory(spark: SparkSession, d: String): DataFrame = {
      val r = region(spark, d)
      val nj = nation(spark, d)
        .join(r, col("n_regionkey") === col("r_regionkey"))
      val regions = r.select(
        (lit(100L) + col("r_regionkey").cast("long")).as("id"),
        concat(lit("/"), col("r_name")).as("dir_path"))
      val nations = nj.select(
        (lit(200L) + col("n_nationkey").cast("long")).as("id"),
        concat(lit("/"), col("r_name"), lit("/"), col("n_name")).as("dir_path"))
      val archives = nj.select(
        (lit(300L) + col("n_nationkey").cast("long")).as("id"),
        concat(lit("/"), col("r_name"), lit("/"), col("n_name"), lit("/archive")).as("dir_path"))
      regions.unionByName(nations).unionByName(archives)
        .withColumn("ctime", t0).withColumn("mtime", t0)
        .withColumn("inserted_on", t0).withColumn("updated_on", t0)
    }

    /** `file`: one file per order, homed in its customer's nation dir
      * (every 7th order in the nation's `archive` subdir). `size` is in MB
      * (DecimalType(18,6) per `File.py:120`), deliberately coarse
      * (floor(totalprice/10000)) so duplicate-size groups exist. */
    def file(spark: SparkSession, d: String): DataFrame = {
      val cust = customer(spark, d).select("c_custkey", "c_nationkey")
      orders(spark, d)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(
          col("o_orderkey").as("id"),
          concat(lit("order_"), col("o_orderkey").cast("string"), lit("."),
            when(col("o_orderstatus") === "O", "txt")
              .when(col("o_orderstatus") === "F", "log")
              .otherwise("dat")).as("name"),
          (when(col("o_orderkey") % 7 === 0, 300L).otherwise(200L)
            + col("c_nationkey").cast("long")).as("dir_id"),
          floor(col("o_totalprice") / 10000).cast(DecimalType(18, 6)).as("size"),
          col("o_orderdate").as("ctime"),
          col("o_orderdate").as("mtime"),
          lit(null).cast("timestamp").as("atime"))
        .withColumn("inserted_on", t0).withColumn("updated_on", t0)
    }

    /** `hash`: 2/3 of files are hashed (`o_orderkey % 3 <> 0`); the rest
      * exercise the not-yet-hashed anti-joins (SURVEY J12). Hash values are
      * md5 of a coarse (priority, price-bucket) key so duplicate groups
      * exist for the duplicate-file queries (SURVEY J5/J7/A3). */
    def hash(spark: SparkSession, d: String): DataFrame = {
      val bucket = floor(col("o_totalprice") / 10000).cast("int").cast("string")
      val key = concat(col("o_orderpriority"), lit("#"), bucket)
      orders(spark, d)
        .filter(col("o_orderkey") % 3 =!= 0)
        .select(
          col("o_orderkey").as("id"),
          col("o_orderkey").as("file_id"),
          md5(key).as("md5_hash"),
          t0.as("md5_hash_time"),
          md5(concat(lit("sha1|"), key)).as("sha1_hash"),
          t0.as("sha1_hash_time"))
    }

    /** `file_category` lookup (`File.py:191-198`; the repo ships no seed
      * data, so these rows are ours). */
    def fileCategory(spark: SparkSession): DataFrame = {
      import spark.implicits._
      Seq(("txt", "document"), ("log", "logfile"), ("dat", "data"), ("jpg", "image"))
        .toDF("extension", "category")
    }

    /** `directory_control` (`DirectoryCrawl.py:528-545`): the crawl
      * schedule. Counts/cadence are deterministic functions of dir_id so
      * the T1 scheduling queries have a meaningful, oracle-checkable
      * work-queue shape. */
    def directoryControl(spark: SparkSession, d: String): DataFrame =
      directory(spark, d).select(
        col("dir_path"),
        col("id").as("dir_id"),
        ((col("id") * 13) % 250).cast("int").as("file_count"),
        ((col("id") * 7) % 40).cast("int").as("subdir_count"),
        (t0 + expr("make_interval(0,0,0,0,CAST(id % 8760 AS INT),0,0)")).as("next_crawl"),
        (lit(900) + ((col("id") % 168) * 3600)).cast("int").as("crawl_frequency"),
        lit(null).cast("int").as("assigned_process_id"),
        when(col("id") % 11 === 0, t0).otherwise(lit(null).cast("timestamp"))
          .as("process_assigned_on"),
        t0.as("last_crawled"),
        lit(null).cast("timestamp").as("last_active"),
        (col("id") % 13 === 0).as("dir_missing"),
        t0.as("inserted_on"))

    /** `hash_control` (`DirectoryCrawl.py:551-562`): pending hash queue —
      * every 5th file awaits hashing. */
    def hashControl(spark: SparkSession, d: String): DataFrame =
      file(spark, d)
        .filter(col("id") % 5 === 0)
        .select(
          col("id").as("file_id"),
          col("mtime"),
          col("size").as("file_size"),
          lit(null).cast("timestamp").as("process_assigned_on"),
          lit(false).as("file_missing"),
          t0.as("inserted_on"))
  }
}

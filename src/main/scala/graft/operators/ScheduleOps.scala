package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's work-scheduling query surface (SURVEY §2.5 T1/T2, §2.4
  * A5, §2.8 M7): priority-ordered top-K selection over the crawl schedule
  * and the hash queue.
  *
  * The reference claims rows via `UPDATE … RETURNING` because many OS
  * processes race for work (`FileDbDAL/DirectoryCrawl.py:640-741`). In
  * Spark the whole due-frontier is selected in one batch and partitioned
  * across executors, so the claim step disappears (SURVEY §7.4.1); the
  * selection queries below keep the exact ordering semantics.
  *
  * Scale: `orderBy(...).limit(k)` compiles to `TakeOrderedAndProject` — a
  * per-partition top-K + driver merge, no global sort, no shuffle. That
  * holds at any input size as long as k stays bounded (it is: the
  * reference uses k≤10).
  */
object ScheduleOps {

  /** Crawl priority (`DirectoryCrawl.py:662-667`): hours overdue plus
    * size-of-directory terms. Deviation (documented): the reference's
    * `round(file_count/100)` is integer division in Postgres (a no-op
    * round); we use `floor(x/100.0)` — explicit, and identical across
    * engines for every input. */
  def crawlPriority(asOf: Column): Column =
    (unix_timestamp(asOf) - unix_timestamp(col("next_crawl"))).cast("double") / 3600d +
      floor(col("file_count") / 100d) + floor(col("subdir_count") / 100d)

  /** `get_dirs_to_crawl` (T1, `DirectoryCrawl.py:640-687`): due,
    * unclaimed, not-missing dirs, highest priority first. `dir_path` is a
    * unique tiebreaker so the top-K set is deterministic. */
  def dirsToCrawl(directoryControl: DataFrame, asOf: Column, limit: Int): DataFrame =
    directoryControl
      .filter(col("next_crawl") < asOf &&
        col("process_assigned_on").isNull && !col("dir_missing"))
      .withColumn("priority", crawlPriority(asOf))
      .orderBy(col("priority").desc, col("dir_path"))
      .limit(limit)
      .select("dir_path", "dir_id", "file_count", "subdir_count", "priority")

  /** `get_files_to_hash` (T2, `DirectoryCrawl.py:689-741`): smallest files
    * first (maximize files/s), joined to the file-detail view for full
    * paths. `file_id` tiebreaks equal sizes. */
  def filesToHash(hashControl: DataFrame, vwFileDetail: DataFrame, limit: Int): DataFrame =
    hashControl
      .filter(col("process_assigned_on").isNull && !col("file_missing"))
      .orderBy(col("file_size"), col("file_id"))
      .limit(limit)
      .select("file_id", "file_size")
      .join(vwFileDetail.select(col("id"), col("full_path")),
        col("file_id") === col("id"))
      .select("file_id", "full_path", "file_size")

  /** Drives not yet scheduled (J9, `DirectoryCrawl.py:423-450`): anti-join
    * of crawl roots against the schedule. */
  def unscheduledDrives(drive: DataFrame, directoryControl: DataFrame): DataFrame =
    drive.join(directoryControl.select("dir_path"), Seq("dir_path"), "left_anti")

  /** `view_scrape_schedule` (`API/Schedule.py:11-44`): wildcard-translated
    * ILIKE path filter (recursive appends '%'), ORDER BY sanitized against
    * the reference's allowlist (unknown columns dropped; empty →
    * `dir_path asc`), row limit clamped to ≥1. Composes the F7
    * case-insensitive filter with the T5 paging semantics. */
  def viewScrapeSchedule(directoryControl: DataFrame, path: String,
                         recursive: Boolean = false,
                         orderBy: Seq[(String, Boolean)] = Nil,
                         rowLimit: Int = 100): DataFrame = {
    val parsed = graft.functions.PathFunctions.parseWildcardSearch(path)
    val like = if (recursive && !parsed.endsWith("%")) parsed + "%" else parsed
    val validOrderCols = Set("dir_path", "file_count", "subdir_count",
      "next_crawl", "crawl_frequency", "last_crawled", "last_active", "inserted_on")
    val requested = orderBy.collect {
      case (c, asc) if validOrderCols(c) => if (asc) col(c).asc else col(c).desc
    }
    val sorted = if (requested.nonEmpty) requested else Seq(col("dir_path").asc)
    directoryControl
      .filter(lower(col("dir_path")).like(like.toLowerCase))
      .select("dir_path", "dir_id", "file_count", "subdir_count", "next_crawl",
        "crawl_frequency", "process_assigned_on", "last_crawled", "last_active",
        "inserted_on")
      .orderBy(sorted: _*)
      .limit(math.max(rowLimit, 1))
  }

  /** `reschedule_dir` (`API/Schedule.py:7-9` — a stub in the reference;
    * intended semantics per `API/Scrape.py:18-25` schedule_scrape_dir):
    * matching dirs (wildcard ILIKE) become due at `asOf`, optionally with
    * a new crawl frequency. Returns the next directory_control state. */
  def rescheduleDir(directoryControl: DataFrame, path: String,
                    asOf: Column, frequencySeconds: Option[Long] = None): DataFrame = {
    val like = graft.functions.PathFunctions.parseWildcardSearch(path)
    val hit = lower(col("dir_path")).like(like.toLowerCase)
    val due = directoryControl.withColumn("next_crawl",
      when(hit, asOf).otherwise(col("next_crawl")))
    frequencySeconds.fold(due)(f => due.withColumn("crawl_frequency",
      when(hit, lit(f)).otherwise(col("crawl_frequency"))))
  }

  /** M3 finalize (`mark_dirs_crawled`, `DirectoryCrawl.py:948-1045`): fold
    * one crawl round's outcome back into `directory_control`.
    *
    * `crawled` carries one row per crawled dir: `dir_path`, `fc`/`sc`
    * (observed file/subdir counts) and `new_freq` (the M7 frequency).
    * `missing` flags the crawled dirs whose scrape found no directory.
    * Crawled dirs get fresh counts, `next_crawl` pushed out by the new
    * frequency (or the missing retry), `last_crawled` stamped, and their
    * process claim cleared; missing dirs are flagged and retried after
    * `missingRetrySeconds`.
    *
    * `clearAllClaims` / `preserveMissing`: the reference updates ONLY the
    * crawled rows (defaults). [[graft.server.CrawlPipeline]] passes
    * `clearAllClaims = true, preserveMissing = false` — its claim-free
    * batch model (SURVEY §7.4.1/M8) resets every claim each round and
    * un-flags missing dirs so the retry schedule can reach them (its
    * due-frontier filter skips flagged dirs).
    *
    * One broadcast-sized left join per input (the crawled set is one
    * round's frontier, bounded by the T1 batch limit) against the control
    * table — at scale the control table never shuffles. */
  def markDirsCrawled(directoryControl: DataFrame, crawled: DataFrame,
                      missing: DataFrame, asOf: Column,
                      missingRetrySeconds: Long = 3600,
                      clearAllClaims: Boolean = false,
                      preserveMissing: Boolean = true): DataFrame =
    directoryControl
      .join(crawled.select(col("dir_path"), lit(true).as("crawled"),
        col("fc"), col("sc"), col("new_freq")), Seq("dir_path"), "left")
      .join(missing.select(col("dir_path"), lit(true).as("went_missing")),
        Seq("dir_path"), "left")
      .select(
        col("dir_path"), col("dir_id"),
        when(col("crawled"), coalesce(col("fc"), lit(0)).cast("int"))
          .otherwise(col("file_count")).as("file_count"),
        when(col("crawled"), coalesce(col("sc"), lit(0)).cast("int"))
          .otherwise(col("subdir_count")).as("subdir_count"),
        when(col("went_missing"),
            timestamp_seconds(unix_timestamp(asOf) + missingRetrySeconds))
          .when(col("crawled"),
            timestamp_seconds(unix_timestamp(asOf) + col("new_freq")))
          .otherwise(col("next_crawl")).as("next_crawl"),
        when(col("crawled") && !coalesce(col("went_missing"), lit(false)),
          col("new_freq")).otherwise(col("crawl_frequency")).cast("long")
          .as("crawl_frequency"),
        col("assigned_process_id"),
        (if (clearAllClaims) lit(null).cast("timestamp")
         else when(col("crawled"), lit(null).cast("timestamp"))
           .otherwise(col("process_assigned_on"))).as("process_assigned_on"),
        when(col("crawled"), asOf).otherwise(col("last_crawled")).as("last_crawled"),
        col("last_active"),
        (if (preserveMissing)
           when(col("crawled"), coalesce(col("went_missing"), lit(false)))
             .otherwise(col("dir_missing"))
         else coalesce(col("went_missing"), lit(false))).as("dir_missing"),
        col("inserted_on"))

  /** Adaptive crawl frequency (M7, `SQLUtil.py:443-563` with the
    * `DirectoryCrawl.py:1011-1019` call-site params): seconds since the
    * directory's last content change (max ctime of its contents, falling
    * back to `inserted_on`), divided by `divideSeconds`, clamped to
    * [minSeconds, maxSeconds]. */
  def crawlFrequency(dirActivity: DataFrame, asOf: Column,
                     divideSeconds: Int = 30,
                     minSeconds: Int = 900,
                     maxSeconds: Int = 604800): DataFrame =
    dirActivity.withColumn("crawl_frequency",
      greatest(lit(minSeconds.toLong), least(lit(maxSeconds.toLong),
        floor((unix_timestamp(asOf) -
          unix_timestamp(coalesce(col("last_ctime"), col("inserted_on"))))
          / divideSeconds.toLong))).cast("long"))
}

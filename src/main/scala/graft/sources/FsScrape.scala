package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.BasicFileAttributes
import java.sql.Timestamp

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Filesystem scraping sources (SURVEY S1–S3): one crawl round scrapes ONE
  * level of each pending directory — `Files.list`, not a recursive walk —
  * exactly like the reference's `next(os.walk(dir))`
  * (`FileDbDAL/DirectoryCrawl.py:62-85`); recursion happens across rounds
  * through the schedule (new subdirs are inserted into `directory_control`
  * and picked up by a later round).
  *
  * Execution model: the pending-dirs batch is partitioned across executors
  * and scraped inside `mapPartitions` — the reference's process pools
  * collapse into Spark tasks; the claim protocol disappears because a dir
  * appears in exactly one partition of the batch (SURVEY §7.4.1).
  *
  * Sizes are MEGABYTES (`bytes / 1e6`, decimal) per `FileDbDAL/File.py:35`.
  * Unreadable/vanished dirs are tolerated and flagged (`dir_missing`),
  * mirroring `DirectoryCrawl.py:77-78`.
  */
object FsScrape {

  /** One scraped row; `kind` ∈ file | dir | self | missing_dir |
    * invalid_name (`self` = the scraped directory's own metadata, S3;
    * `invalid_name` = dead-lettered entry whose name fails the UTF-8
    * validity screen — see [[utf8Encodable]]). */
  final case class ScrapeRecord(
      kind: String,
      dirPath: String, // the scraped parent
      name: String, // file/subdir basename ("" for missing_dir)
      fullPath: String,
      sizeMb: java.math.BigDecimal, // null for dirs
      ctime: Timestamp, // creation time where the FS exposes it
      mtime: Timestamp,
      atime: Timestamp)

  private def ts(millis: Long): Timestamp = new Timestamp(millis)

  // ---- UTF-8 validity screen (SURVEY §2.9) ---------------------------------
  // The reference silently SKIPS rows whose names fail UTF-8 encoding
  // before insert (FileDbDAL/DirectoryCrawl.py:87-115). A JVM string
  // fails the UTF-8 round-trip exactly when it carries lone surrogates
  // (the JDK's decoding of un-decodable filesystem bytes). Such entries
  // are DEAD-LETTERED as kind=invalid_name records — never merged into
  // the catalog, never silently lost: the staged row keeps the evidence
  // with lone surrogates escaped as \uXXXX so the pattern is recoverable.

  /** True iff `s` round-trips through UTF-8 (no unpaired surrogates). */
  def utf8Encodable(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))) return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  /** Render `s` with every LONE surrogate escaped as `\uXXXX` (paired
    * surrogates — real supplementary characters — pass through), so the
    * dead-letter record survives the UTF-8 storage layer losslessly. */
  def escapeLoneSurrogates(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c) && i + 1 < s.length &&
        Character.isLowSurrogate(s.charAt(i + 1))) {
        sb.append(c).append(s.charAt(i + 1)); i += 2
      } else if (Character.isHighSurrogate(c) || Character.isLowSurrogate(c)) {
        sb.append(f"\\u${c.toInt}%04x"); i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The dead-letter relation of a scrape: quarantined invalid-name rows
    * (kept in staging, consumed by no merge path). */
  def quarantined(scraped: DataFrame): DataFrame =
    scraped.filter(col("kind") === "invalid_name")

  /** Scrape one directory level imperatively (executor-side). */
  def scrapeDir(dirPath: String): Seq[ScrapeRecord] = {
    val dir = Paths.get(dirPath)
    if (!Files.isDirectory(dir))
      return Seq(ScrapeRecord("missing_dir", dirPath, "", dirPath, null, null, null, null))
    try {
      val selfAttrs = Files.readAttributes(dir, classOf[BasicFileAttributes])
      val self = ScrapeRecord("self", dirPath, "", dirPath, null,
        ts(selfAttrs.creationTime.toMillis), ts(selfAttrs.lastModifiedTime.toMillis),
        ts(selfAttrs.lastAccessTime.toMillis))
      // Files.list holds an open directory handle — close it or a
      // long-running crawl exhausts file descriptors
      val listing = Files.list(dir)
      val entries =
        try listing.iterator().asScala.toSeq
        finally listing.close()
      self +: entries.flatMap { p =>
        try {
          val attrs = Files.readAttributes(p, classOf[BasicFileAttributes])
          val name = p.getFileName.toString
          val ctime = ts(attrs.creationTime.toMillis)
          val mtime = ts(attrs.lastModifiedTime.toMillis)
          val atime = ts(attrs.lastAccessTime.toMillis)
          if (!utf8Encodable(name))
            // dead-letter, not silent skip: quarantine with evidence
            Some(ScrapeRecord("invalid_name", dirPath, escapeLoneSurrogates(name),
              escapeLoneSurrogates(p.toString), null, ctime, mtime, atime))
          else if (attrs.isDirectory)
            Some(ScrapeRecord("dir", dirPath, name, p.toString, null, ctime, mtime, atime))
          else if (attrs.isRegularFile) {
            val sizeMb = new java.math.BigDecimal(attrs.size)
              .divide(new java.math.BigDecimal(1000000), 6, java.math.RoundingMode.HALF_UP)
            Some(ScrapeRecord("file", dirPath, name, p.toString, sizeMb, ctime, mtime, atime))
          } else None // sockets, fifos, symlink targets gone, …
        } catch { case NonFatal(_) => None } // stat raced with deletion → skip
      }
    } catch {
      case NonFatal(_) =>
        Seq(ScrapeRecord("missing_dir", dirPath, "", dirPath, null, null, null, null))
    }
  }

  /** Distributed scrape of a batch of pending directories. `pendingDirs`
    * needs a `dir_path` column; the batch is repartitioned so one slow
    * (huge) directory can't serialize the round. */
  def scrapeBatch(spark: SparkSession, pendingDirs: DataFrame,
                  parallelism: Int = 0): Dataset[ScrapeRecord] = {
    import spark.implicits._
    val paths = pendingDirs.select(col("dir_path")).as[String]
    val n = if (parallelism > 0) parallelism
      else spark.sparkContext.defaultParallelism
    paths.repartition(n).mapPartitions(_.flatMap(scrapeDir))
  }

  /** Split a scrape result into the three staged relations the merge
    * pipelines consume: (stagedFiles, stagedDirs, missingDirPaths). */
  def split(scraped: Dataset[ScrapeRecord]): (DataFrame, DataFrame, DataFrame) = {
    val cached = scraped.toDF()
    val files = cached.filter(col("kind") === "file").select(
      col("name"), col("dirPath").as("dir_path"), col("sizeMb").as("size"),
      col("ctime"), col("mtime"), col("atime"))
    val dirs = cached.filter(col("kind") === "dir").select(
      col("fullPath").as("dir_path"), col("dirPath").as("parent_path"),
      col("ctime"), col("mtime"))
    val missing = cached.filter(col("kind") === "missing_dir")
      .select(col("dirPath").as("dir_path"))
    (files, dirs, missing)
  }
}

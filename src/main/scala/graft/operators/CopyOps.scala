package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PathFunctions
import graft.sources.HashSource

/** File copy/move sink (SURVEY S8 `FileHandler/CopyFile.py:32-111` +
  * T3 queue `FileDbDAL/FileHandler.py:107-165`).
  *
  * The work queue is a DataFrame; execution is a `mapPartitions`
  * side-effecting sink that returns per-row result codes as data (the
  * reference's error-code convention) rather than throwing. Validation =
  * post-copy size + MD5 compare, exactly the reference's re-hash check.
  *
  * Reference bugs fixed with intended semantics (SURVEY T3 ⚠): the
  * `ifnull`/`set c.` PL/pgSQL typos → `coalesce(new_file_name,
  * basename(source))` destination naming.
  */
object CopyOps {

  /** Result codes, mirroring the reference's convention: 0 ok; 1 source
    * missing; 2 destination exists (overwrite='N'); 3 validation failed;
    * 4 IO error. */
  final case class CopyResult(
      source_path: String, dest_path: String, status: Int,
      detail: String, copied_on: Timestamp)

  /** T3 selection: FIFO by `inserted_on` (tiebreak id), destination path
    * computed as `path_join(dest_dir, coalesce(new_file_name,
    * basename(source)))`. Queue columns: id, source_path, dest_dir,
    * new_file_name, overwrite, move_file, inserted_on. */
  def filesToCopy(queue: DataFrame, limit: Int): DataFrame =
    queue.orderBy(col("inserted_on"), col("id")).limit(limit)
      .select(col("id"), col("source_path"),
        PathFunctions.pathJoin(col("dest_dir"),
          coalesce(col("new_file_name"),
            PathFunctions.basename(col("source_path")))).as("dest_path"),
        col("overwrite"), col("move_file"))

  /** Execute a copy batch on the executors; one row per attempt with its
    * result code. `overwrite`: 'Y' replace, 'N' fail if exists, 'W' keep
    * both (suffix) — reference flag semantics. */
  def executeCopies(spark: SparkSession, work: DataFrame,
                    asOf: Timestamp): DataFrame = {
    import spark.implicits._
    work.select(col("source_path"), col("dest_path"),
        coalesce(col("overwrite"), lit("N")).as("overwrite"),
        coalesce(col("move_file"), lit(false)).as("move_file"))
      .as[(String, String, String, Boolean)]
      .mapPartitions(_.map { case (src, dst, ow, move) =>
        copyOne(src, dst, ow, move, asOf)
      }).toDF()
  }

  def copyOne(src: String, dst0: String, overwrite: String,
                                 move: Boolean, asOf: Timestamp): CopyResult = {
    val srcPath = Paths.get(src)
    if (!Files.isRegularFile(srcPath))
      return CopyResult(src, dst0, 1, "source missing", asOf)
    try {
      val dst = overwrite.toUpperCase match {
        case "W" =>
          // keep-both: first free "name (n)" variant
          var candidate = Paths.get(dst0)
          var n = 1
          while (Files.exists(candidate)) {
            candidate = Paths.get(dst0 + s" ($n)")
            n += 1
          }
          candidate
        case "Y" => Paths.get(dst0)
        case _ =>
          if (Files.exists(Paths.get(dst0)))
            return CopyResult(src, dst0, 2, "destination exists", asOf)
          Paths.get(dst0)
      }
      val preSize = Files.size(srcPath)
      val preHash = HashSource.hashFile(src)
      Files.createDirectories(dst.getParent)
      Files.copy(srcPath, dst, StandardCopyOption.REPLACE_EXISTING)
      // validation: size + MD5 must survive the copy (reference re-hash)
      val postSize = Files.size(dst)
      val postHash = HashSource.hashFile(dst.toString)
      val valid = (preHash, postHash) match {
        case (Right((m1, _)), Right((m2, _))) => preSize == postSize && m1 == m2
        case _ => false
      }
      if (!valid) {
        Files.deleteIfExists(dst)
        return CopyResult(src, dst.toString, 3, "validation failed", asOf)
      }
      if (move) Files.delete(srcPath)
      CopyResult(src, dst.toString, 0, null, asOf)
    } catch {
      case NonFatal(e) =>
        CopyResult(src, dst0, 4, e.getClass.getSimpleName + ": " + e.getMessage, asOf)
    }
  }

  /** `copy_directory` queue expansion (`FileDbDAL/FileHandler.py:62-82` —
    * the reference installs the table but its server never drains it; the
    * intended dataflow is one directory request → per-file copy work).
    * Each request resolves to a root (by `dir_path`, or `dir_id` through
    * the catalog), fans out over the root's descendant closure (broadcast
    * prefix join — requests are few, the catalog is big), and emits one
    * copy-file queue row per file with the relative layout preserved
    * under `new_parent_dir/new_dir_name` (name defaults to the root's
    * basename, the reference's blank-name rule).
    *
    * Queue columns: id, dir_id (nullable), dir_path (nullable),
    * new_parent_dir, new_dir_name (nullable), move_dir, overwrite,
    * inserted_on. Output matches [[filesToCopy]]'s input contract. */
  def expandDirectoryCopies(queue: DataFrame, directory: DataFrame,
                            file: DataFrame): DataFrame = {
    val byId = directory.select(col("id").as("r_id"), col("dir_path").as("r_path"))
    val requests = queue
      .join(broadcast(byId), col("dir_id") === col("r_id"), "left")
      .select(col("id").as("req_id"),
        coalesce(col("dir_path"), col("r_path")).as("root_path"),
        col("new_parent_dir"), col("new_dir_name"),
        col("move_dir"), col("overwrite"), col("inserted_on"))
      .filter(col("root_path").isNotNull)
    val closure = directory
      .select(col("id").as("d_id"), col("dir_path").as("d_path"))
      .join(broadcast(requests),
        col("d_path") === col("root_path") ||
          col("d_path").startsWith(concat(col("root_path"), lit("/"))) ||
          col("d_path").startsWith(concat(col("root_path"), lit("\\"))))
    val destRoot = PathFunctions.pathJoin(col("new_parent_dir"),
      coalesce(col("new_dir_name"), PathFunctions.basename(col("root_path"))))
    // project file down before the join: the full catalog `file` schema
    // carries its own inserted_on/updated_on, which would collide with the
    // request's inserted_on in the output projection
    file.select(col("id"), col("name"), col("dir_id"))
      .join(closure, col("dir_id") === col("d_id"))
      .select(
        // deterministic work ids: keyed by (request, source file)
        pmod(xxhash64(col("req_id"), col("id")), lit(Long.MaxValue)).as("id"),
        PathFunctions.pathJoin(col("d_path"), col("name")).as("source_path"),
        // dest dir = mapped root + the source dir's path relative to it
        concat(destRoot,
          col("d_path").substr(length(col("root_path")) + 1, lit(Int.MaxValue)))
          .as("dest_dir"),
        lit(null).cast("string").as("new_file_name"),
        col("overwrite"),
        col("move_dir").as("move_file"),
        col("inserted_on"))
  }

  /** T4 removal-queue drain: FIFO `ORDER BY inserted_on LIMIT n` batch
    * (`DirectoryCrawl.py:1110-1190`); returns (batch, remainingQueue). */
  def drainRemovalQueue(queue: DataFrame, limit: Int): (DataFrame, DataFrame) = {
    val batch = queue.orderBy(col("inserted_on"), col("id")).limit(limit)
    val remaining = queue.join(batch.select("id"), Seq("id"), "left_anti")
    (batch, remaining)
  }
}

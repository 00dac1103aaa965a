package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.StateStore
import graft.operators.{SearchOps, Views}
import graft.server.CrawlPipeline
import graft.server.CrawlPipeline.Config

/** End-to-end slice (SURVEY §7.2): crawl a real fixture tree → merge →
  * hash → flagship duplicate query → change tracking on re-crawl. */
class CrawlPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var fixture: Path = _
  private var stateDir: Path = _
  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-01-02 00:00:00")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("crawl-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    fixture = Files.createTempDirectory("graft_fixture")
    stateDir = Files.createTempDirectory("graft_state")
    // tree:  root/{a.bin, b.bin(dup of a), sub/{c.bin, d.bin(dup of a)}, empty/}
    val sub = Files.createDirectories(fixture.resolve("sub"))
    Files.createDirectories(fixture.resolve("empty"))
    Files.write(fixture.resolve("a.bin"), "duplicate-content".getBytes)
    Files.write(fixture.resolve("b.bin"), "duplicate-content".getBytes)
    Files.write(sub.resolve("c.bin"), "unique-content".getBytes)
    Files.write(sub.resolve("d.bin"), "duplicate-content".getBytes)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def state = new StateStore(spark, stateDir.toString)

  test("crawl reaches fixpoint and catalogs the tree") {
    CrawlPipeline.seedDrives(state, Seq(fixture.toString), t1)
    val rounds = CrawlPipeline.runToFixpoint(state, t1)
    assert(rounds.nonEmpty && rounds.last.dueDirs > 0)

    val dirs = state.read("directory").collect().map(_.getString(1)).toSet
    assert(dirs === Set(fixture.toString, s"$fixture/sub", s"$fixture/empty"))

    val files = state.read("file")
    assert(files.count() === 4)
    // file identity = (name, dir_id); ids unique
    assert(files.select("id").distinct().count() === 4)
    // sizes are MB decimals: 17 bytes → 0.000017
    val sz = files.filter(col("name") === "a.bin").head().getDecimal(3)
    assert(sz.toPlainString === "0.000017")
    // every file is queued for hashing
    assert(state.read("hash_control").count() === 4)
    // schedule: all crawled dirs rescheduled into the future, counts right
    val ctl = state.read("directory_control")
    assert(ctl.filter(col("next_crawl") <= lit(t1)).count() === 0)
    val rootCtl = ctl.filter(col("dir_path") === fixture.toString).head()
    assert(rootCtl.getAs[Int]("file_count") === 2)
    assert(rootCtl.getAs[Int]("subdir_count") === 2)
    // adaptive frequency clamped to [900, 604800]
    val freqs = ctl.select("crawl_frequency").collect().map(_.getLong(0))
    assert(freqs.forall(f => f >= 900L && f <= 604800L))
  }

  test("hash round digests match MessageDigest, drains the queue") {
    val n = CrawlPipeline.hashRound(state, t1)
    assert(n === 4)
    assert(state.read("hash_control").count() === 0)
    val hash = state.read("hash")
    assert(hash.count() === 4)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("duplicate-content".getBytes).map("%02x".format(_)).mkString
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest("duplicate-content".getBytes).map("%02x".format(_)).mkString
    val row = state.read("file").filter(col("name") === "a.bin")
      .join(hash.select("file_id", "md5_hash", "sha1_hash"),
        col("id") === col("file_id")).head()
    assert(row.getAs[String]("md5_hash") === md)
    assert(row.getAs[String]("sha1_hash") === sha)
  }

  test("flagship duplicate query finds the planted duplicates") {
    val vwLl = Views.vwLl(state.read("directory"), state.read("file"), state.read("hash"))
    val dups = SearchOps.searchDuplicateFile(vwLl, s"$fixture/a.bin")
    val names = dups.collect().map(_.getAs[String]("name")).sorted
    assert(names === Array("a.bin", "b.bin", "d.bin"))
  }

  test("re-crawl: change-only updates, vanished file archived, hash rescheduled") {
    val before = state.read("file").select("name", "updated_on").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1)).toMap

    // the hash round READ every file, which bumped FS atimes — and atime
    // participates in change detection (faithful to the reference). Reset
    // each file's atime to its recorded value so only intended mutations
    // register as changes.
    val d = state.read("directory").select(col("id").as("d_id"), col("dir_path"))
    state.read("file").join(d, col("dir_id") === col("d_id"))
      .select("dir_path", "name", "atime").collect().foreach { r =>
        Files.setAttribute(
          java.nio.file.Paths.get(r.getString(0), r.getString(1)),
          "lastAccessTime",
          java.nio.file.attribute.FileTime.fromMillis(r.getTimestamp(2).getTime))
      }

    // mutate the tree: change c.bin, delete b.bin, add e.bin
    Files.write(fixture.resolve("sub").resolve("c.bin"), "changed-content!".getBytes)
    Files.delete(fixture.resolve("b.bin"))
    Files.write(fixture.resolve("e.bin"), "fresh".getBytes)

    val rounds = CrawlPipeline.runToFixpoint(state, t2)
    assert(rounds.nonEmpty)

    val after = state.read("file")
    val names = after.select("name").collect().map(_.getString(0)).toSet
    assert(names === Set("a.bin", "c.bin", "d.bin", "e.bin"))

    // change-only semantics: a.bin untouched keeps its updated_on;
    // c.bin changed -> bumped to t2; e.bin new -> inserted at t2
    val ts = after.select("name", "updated_on").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    assert(ts("a.bin") === before("a.bin"))
    assert(ts("c.bin") === t2)
    assert(ts("e.bin") === t2)

    // b.bin archived with original audit trail + deletion stamp
    val arch = state.read("file_archive").filter(col("name") === "b.bin")
    assert(arch.count() === 1)
    assert(arch.head().getAs[Timestamp]("deleted_on") === t2)
    // its hash rows were cleaned up
    val bId = arch.head().getAs[Long]("id")
    assert(state.read("hash").filter(col("file_id") === bId).count() === 0)

    // changed + new files are back in the hash queue; unchanged are not
    val queued = state.read("hash_control")
      .join(after.select(col("id").as("file_id"), col("name")), Seq("file_id"))
      .select("name").collect().map(_.getString(0)).toSet
    assert(queued === Set("c.bin", "e.bin"))
  }

  test("bucketed file-state mode: same catalog, partial rewrites, empty-bucket cleanup") {
    val cfg = Config(fileBuckets = 8)
    val root = Files.createTempDirectory("graft_bstate")
    val fx = Files.createTempDirectory("graft_bfixture")
    val sub = Files.createDirectories(fx.resolve("sub"))
    Files.write(fx.resolve("r1.bin"), "rootfile".getBytes)
    Files.write(sub.resolve("s1.bin"), "subfile1".getBytes)
    Files.write(sub.resolve("s2.bin"), "subfile2".getBytes)
    val st = new StateStore(spark, root.toString)

    CrawlPipeline.seedDrives(st, Seq(fx.toString), t1)
    CrawlPipeline.runToFixpoint(st, t1, cfg)
    assert(CrawlPipeline.hashRound(st, t1, cfg = cfg) === 3)

    val bs = new graft.core.BucketedState(spark, root.toString, "file", 8)
    val files = bs.read(graft.core.Schemas.file)
    assert(files.count() === 3)
    // bucketed layout on disk
    assert(new java.io.File(s"$root/file").listFiles()
      .exists(_.getName.startsWith("bucket=")))

    // delete EVERY file of sub/ → its bucket's rows must vanish even
    // though dynamic overwrite writes no rows for an emptied bucket
    Files.delete(sub.resolve("s1.bin"))
    Files.delete(sub.resolve("s2.bin"))
    CrawlPipeline.runToFixpoint(st, t2, cfg)

    val after = bs.read(graft.core.Schemas.file)
    assert(after.select("name").collect().map(_.getString(0)).toSet === Set("r1.bin"))
    // both vanished files archived
    assert(st.read("file_archive").filter(col("deleted_on") === lit(t2)).count() === 2)
  }

  test("deep subtree vanishes: whole closure removed via the prefix join, no driver collect") {
    val root = Files.createTempDirectory("graft_dstate")
    val fx = Files.createTempDirectory("graft_dfixture")
    // fx/keep.bin, fx/deep/l1/l2/l3 with a file at every level
    val l3 = Files.createDirectories(fx.resolve("deep/l1/l2/l3"))
    Files.write(fx.resolve("keep.bin"), "keep".getBytes)
    Files.write(fx.resolve("deep/f0.bin"), "d0".getBytes)
    Files.write(fx.resolve("deep/l1/f1.bin"), "d1".getBytes)
    Files.write(fx.resolve("deep/l1/l2/f2.bin"), "d2".getBytes)
    Files.write(l3.resolve("f3.bin"), "d3".getBytes)
    val st = new StateStore(spark, root.toString)

    CrawlPipeline.seedDrives(st, Seq(fx.toString), t1)
    CrawlPipeline.runToFixpoint(st, t1)
    assert(st.read("directory").count() === 5)
    assert(st.read("file").count() === 5)

    // the subtree vanishes wholesale: the re-crawl of fx sees `deep`
    // missing and must remove the entire descendant closure (dirs l1..l3
    // were never re-crawled themselves — only the prefix join reaches them)
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory) x.listFiles().foreach(rm)
      x.delete(): Unit
    }
    rm(fx.resolve("deep").toFile)
    CrawlPipeline.runToFixpoint(st, t2)

    assert(st.read("directory").collect().map(_.getString(1)).toSet === Set(fx.toString))
    assert(st.read("file").select("name").collect().map(_.getString(0)).toSet === Set("keep.bin"))
    assert(st.read("directory_archive").filter(col("deleted_on") === lit(t2)).count() === 4)
    assert(st.read("file_archive").filter(col("deleted_on") === lit(t2)).count() === 4)
    // schedule rows for the vanished dirs are gone too
    assert(st.read("directory_control").count() === 1)
  }

  test("unmounted tree survives: failed scrapes delete nothing, remount restores") {
    val root = Files.createTempDirectory("graft_ustate")
    val fx = Files.createTempDirectory("graft_ufixture")
    val sub = Files.createDirectories(fx.resolve("sub"))
    Files.write(fx.resolve("a.bin"), "aa".getBytes)
    Files.write(sub.resolve("b.bin"), "bb".getBytes)
    val st = new StateStore(spark, root.toString)
    CrawlPipeline.seedDrives(st, Seq(fx.toString), t1)
    CrawlPipeline.runToFixpoint(st, t1)
    assert(st.read("file").count() === 2)

    // "unmount": the whole tree is gone; every due dir's scrape fails.
    // A failed scrape asserts NOTHING about children or files — the
    // catalog must survive untouched, only missing-flagged.
    val parked = fx.resolveSibling("parked_" + fx.getFileName)
    Files.move(fx, parked)
    CrawlPipeline.runToFixpoint(st, t2)
    assert(st.read("directory").count() === 2, "dirs must survive the unmount")
    assert(st.read("file").count() === 2, "files must survive the unmount")
    assert(st.read("file_archive").count() === 0)
    assert(st.read("directory_control").filter(col("dir_missing")).count() > 0)

    // remount and recover: flags clear, catalog unchanged
    Files.move(parked, fx)
    val t3 = Timestamp.valueOf("2024-01-03 00:00:00")
    st.write("directory_control",
      st.read("directory_control").withColumn("next_crawl", lit(t3))
        .withColumn("dir_missing", lit(false)))
    CrawlPipeline.runToFixpoint(st, t3)
    assert(st.read("file").count() === 2)
    assert(st.read("directory").count() === 2)
  }

  test("missing drive root is flagged, retried later, not fatal") {
    val ghostState = new StateStore(spark,
      Files.createTempDirectory("graft_ghost").toString)
    CrawlPipeline.seedDrives(ghostState, Seq("/nonexistent/ghost_dir"), t1)
    val stats = CrawlPipeline.crawlRound(ghostState, t1)
    assert(stats.dueDirs === 1 && stats.missingDirs === 1)
    val ctl = ghostState.read("directory_control").head()
    assert(ctl.getAs[Boolean]("dir_missing"))
    // retried in 24 h (missingRetrySeconds)
    assert(ctl.getAs[Timestamp]("next_crawl") ===
      Timestamp.valueOf("2024-01-02 00:00:00"))
  }
}

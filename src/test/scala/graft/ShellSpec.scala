package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Shell
import graft.core.StateStore
import graft.operators.MergeOps

/** CLI dispatch over a tiny in-state catalog. */
class ShellSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var state: StateStore = _
  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val lines = collection.mutable.Buffer[String]()
  private def shell = new Shell(state, lines.append(_))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    state = new StateStore(spark, Files.createTempDirectory("graft_shell").toString)
    val s = spark
    import s.implicits._
    state.write("directory", MergeOps.upsertDirs(state.read("directory"),
      Seq(("/data", t1, t1), ("/data/sub", t1, t1)).toDF("dir_path", "ctime", "mtime"), t1))
    val dirId = state.read("directory").filter($"dir_path" === "/data").head().getLong(0)
    state.write("file", MergeOps.upsertFiles(state.read("file"),
      Seq(("report.txt", dirId, BigDecimal(1.5), t1, t1, t1))
        .toDF("name", "dir_id", "size", "ctime", "mtime", "atime"), t1))
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("search name with wildcard finds the file; output capped table") {
    lines.clear()
    val sh = shell
    assert(sh.execute("search name report*"))
    assert(lines.exists(_.contains("report.txt")))
  }

  test("cd context resolves relative paths; quoted args survive spaces") {
    val sh = shell
    assert(sh.tokenize("""search file "a b.txt" plain""") ===
      Seq("search", "file", "a b.txt", "plain"))
    sh.execute("cd /data")
    assert(sh.resolve("sub/") === "/data/sub")
    lines.clear()
    sh.execute("pwd")
    assert(lines.last === "/data")
  }

  test("unknown command and exit handling") {
    lines.clear()
    val sh = shell
    assert(sh.execute("frobnicate"))
    assert(lines.last.contains("unknown command"))
    assert(!sh.execute("exit"))
  }
}

package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.StateStore
import graft.functions.PathFunctions
import graft.operators.{SearchOps, Views}

/** Interactive shell (SURVEY §7.1.9) mirroring the reference CLI's command
  * grammar (`CLI/__init__.py:41-52,90-226,291-311`): `search <criteria>
  * <args>`, `cd/pwd` path context, `scrape <path>`, `exit`. Results print
  * as truncated tables (the reference caps pandas display at 50 rows).
  *
  * The shell is a thin dispatch layer — every command resolves to the same
  * library operators the programmatic API exposes; wildcards go through
  * the reference's translation (F5) and relative paths through the cd
  * context exactly like `CLI/__init__.py:170-192`.
  */
class Shell(state: StateStore, out: String => Unit = println) {

  private var cwd: String = "/"
  private val maxRows = 50

  private def spark: SparkSession = state.spark

  private def vwLl: DataFrame =
    Views.vwLl(state.read("directory"), state.read("file"), state.read("hash"))

  /** Resolve a possibly-relative path against the cd context. */
  def resolve(path: String): String = {
    val p = path.trim
    if (p.startsWith("/") || p.matches("^[A-Za-z]:.*")) PathFunctions.parseExactSearch(p)
    else PathFunctions.parseExactSearch(
      if (cwd.endsWith("/")) cwd + p else s"$cwd/$p")
  }

  /** Execute one command line; returns false on `exit`. */
  def execute(line: String): Boolean = {
    val parts = tokenize(line.trim)
    if (parts.isEmpty) return true
    (parts.head.toLowerCase, parts.tail) match {
      case ("exit" | "quit", _) => return false
      case ("pwd", _) => out(cwd)
      case ("cd", Seq(p, _*)) => cwd = resolve(p)
      case ("search", args) => search(args)
      case ("scrape", Seq(p, _*)) => rescrape(resolve(p))
      case ("help", _) => out(helpText)
      case (cmd, _) => out(s"unknown command: $cmd (try 'help')")
    }
    true
  }

  private def search(args: Seq[String]): Unit = args match {
    case Seq("name", pattern, _*) =>
      show(SearchOps.searchName(vwLl, PathFunctions.parseWildcardSearch(pattern)))
    case Seq("name_file", pattern, _*) =>
      show(SearchOps.searchNameFile(vwLl, PathFunctions.parseWildcardSearch(pattern)))
    case Seq("name_dir", pattern, _*) =>
      show(SearchOps.searchNameDir(state.read("directory"),
        PathFunctions.parseWildcardSearch(pattern)))
    case Seq("hash", h, rest @ _*) =>
      show(SearchOps.searchHash(vwLl, h, rest.headOption))
    case Seq("file", paths @ _*) if paths.nonEmpty =>
      show(SearchOps.searchFullPath(vwLl, paths.map(resolve)))
    case Seq("dir", paths @ _*) if paths.nonEmpty =>
      show(SearchOps.searchDir(state.read("directory"), paths.map(resolve)))
    case Seq("duplicate_file", path, _*) =>
      show(SearchOps.searchDuplicateFile(vwLl, resolve(path)))
    case Seq("duplicate_dir", path, _*) =>
      show(SearchOps.searchDuplicateDir(vwLl, resolve(path)))
    case _ =>
      out("usage: search name|name_file|name_dir|hash|file|dir|duplicate_file|duplicate_dir <args>")
  }

  /** M10 (`API/Scrape.py:16-24`): mark matching dirs due now. */
  private def rescrape(pattern: String): Unit = {
    val like = PathFunctions.parseWildcardSearch(pattern)
    val ctl = state.read("directory_control")
    val updated = ctl.withColumn("next_crawl",
      when(lower(col("dir_path")).like(like.toLowerCase),
        current_timestamp()).otherwise(col("next_crawl")))
    state.write("directory_control", updated)
    out(s"rescheduled dirs matching $pattern")
  }

  private def show(df: DataFrame): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    val hdr = df.columns.mkString("\t")
    out(hdr)
    rows.take(maxRows).foreach(r => out(r.toSeq.map(v =>
      if (v == null) "NULL" else v.toString).mkString("\t")))
    if (rows.length > maxRows) out(s"... (display capped at $maxRows rows)")
  }

  /** csv-style tokenization with quoted-arg support (CLI/__init__.py:128-131). */
  def tokenize(line: String): Seq[String] = {
    val tokens = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    line.foreach {
      case '"' => inQuote = !inQuote
      case c if c.isWhitespace && !inQuote =>
        if (cur.nonEmpty) { tokens += cur.result(); cur.clear() }
      case c => cur += c
    }
    if (cur.nonEmpty) tokens += cur.result()
    tokens.result()
  }

  private val helpText =
    """commands:
      |  search name <pattern>           wildcard search over files and dirs
      |  search name_file <pattern>      files only
      |  search name_dir <pattern>       dirs only
      |  search hash <hex> [MD5|SHA1]    content-hash lookup
      |  search file <path> [...]        exact file paths
      |  search dir <path> [...]         exact dir paths
      |  search duplicate_file <path>    duplicates of a file
      |  search duplicate_dir <path>     duplicates of a dir's contents
      |  scrape <pattern>                reschedule matching dirs for crawl
      |  cd <path> / pwd                 path context
      |  exit""".stripMargin
}

/** REPL main: `runMain graft.cli.ShellMain <stateDir>`. */
object ShellMain {
  def main(args: Array[String]): Unit = {
    val stateDir = args.headOption.getOrElse(sys.error("usage: ShellMain <stateDir>"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shell = new Shell(new StateStore(spark, stateDir))
    val in = new java.util.Scanner(System.in)
    print("graft> ")
    while (in.hasNextLine && shell.execute(in.nextLine())) print("graft> ")
    spark.stop()
  }
}

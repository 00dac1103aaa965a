package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Path scalar functions — the reference engine's "standard library".
  *
  * Semantics from the reference's PL/pgSQL utilities
  * (`FileDbDAL/SQLUtil.py:14-212`) and their Python twins
  * (`API/Util.py:35-168`), re-expressed as Catalyst `Column` compositions.
  * Everything here is built from codegen'd builtins (`regexp_replace`,
  * `concat`, `when`, `lower`) — no UDFs — so the functions inline into
  * WholeStageCodegen and predicates over them remain pushdown-friendly
  * where possible.
  *
  * Regex notes: the reference's `basepath` uses a lookbehind
  * (`(?<=.)[\/\\][^\/\\]+$`). We use the equivalent capture-group form
  * `(.)[/\\][^/\\]+$ -> $1` which behaves identically and also runs on
  * RE2-based engines (keeps the DuckDB oracle SQL byte-equivalent).
  */
object PathFunctions {

  /** Parent directory of a path (`SQLUtil.py:14-29`).
    * "C:\Windows\calc.exe" -> "C:\Windows"; "C:\foo" -> "C:\" (drive root
    * keeps its slash); "/a/b" -> "/a"; "/a" -> "/a" (no separator preceded
    * by a char -> unchanged, faithful to the reference).
    */
  def basepath(p: Column): Column = {
    // (?s) + \z: '.' must cross newlines and the anchor must be true
    // end-of-input — POSIX filenames may contain '\n', and Java's default
    // '.'/'$' would silently diverge from the byte-scan fast twin and RE2
    val stripped = regexp_replace(p, "(?s)(.)[/\\\\][^/\\\\]+\\z", "$1")
    when(stripped.endsWith(":"), concat(stripped, lit("\\"))).otherwise(stripped)
  }

  /** Last path segment (`SQLUtil.py:31-44`). "C:\W\calc.exe" -> "calc.exe". */
  def basename(p: Column): Column = regexp_replace(p, "(?s)^.+[/\\\\]", "")

  /** Lower-cased extension (`SQLUtil.py:46-61`). Reference quirk preserved:
    * a dotless name is returned whole (lower-cased). */
  def extension(p: Column): Column = lower(regexp_replace(p, "(?s)^.+\\.", ""))

  /** Join path segments, inferring the separator from the content — the
    * Python twin's semantics (`API/Util.py:146-161`), which handle mixed-OS
    * data; the SQL version hardcodes '\' (`SQLUtil.py:64-74`). */
  def pathJoin(dir: Column, name: Column): Column =
    concat(dir, pathSeparator(concat(dir, name)), name)

  /** Separator inference (`API/Util.py:131-144`): windows-definitive (drive
    * letter prefix, no '/') -> '\'; nix-definitive (leading '/', no '\') ->
    * '/'; else fuzzy: any '\' and no '/' -> '\'; default '/'. */
  def pathSeparator(p: Column): Column = {
    val t = trim(p)
    val hasFwd = t.contains("/")
    val hasBack = t.contains("\\")
    when(t.rlike("^[A-Za-z]:") && !hasFwd, lit("\\"))
      .when(t.startsWith("/") && !hasBack, lit("/"))
      .when(hasBack && !hasFwd, lit("\\"))
      .otherwise(lit("/"))
  }

  /** Path-OS classification (`API/Util.py:92-113`): "nix", "win", fuzzy
    * "nix?"/"win?", or "" when undeterminable. */
  def pathOs(p: Column): Column = {
    val t = trim(p)
    val hasFwd = t.contains("/")
    val hasBack = t.contains("\\")
    when(t.startsWith("/") && !hasBack, lit("nix"))
      .when(t.rlike("^[A-Za-z]:") && !hasFwd, lit("win"))
      .when(hasFwd && !hasBack, lit("nix?"))
      .when(hasBack && !hasFwd, lit("win?"))
      .otherwise(lit(""))
  }

  /** Trim + strip trailing slashes (`SQLUtil.py:156-172`, `API/Util.py:163-168`).
    * Faithful to the reference regex `([^:])?[\|/]+$ -> \1` (the char class
    * is backslash, pipe, slash): "/home/test/" -> "/home/test", "C:\" -> "C:",
    * "/" -> "". */
  def stripTrailingSlashes(p: Column): Column =
    regexp_replace(trim(p), "(?s)([^:])?[\\\\|/]+\\z", "$1")

  // --- size-literal -> MB-unit converters (`SQLUtil.py:76-114`; decimal 1000s)
  def kb(x: Column): Column = x / 1000d
  def mb(x: Column): Column = x / 1d
  def gb(x: Column): Column = x / 0.001
  def tb(x: Column): Column = x / 0.000001

  // --- MB-column -> display-unit converters (`SQLUtil.py:116-154`; binary
  // 1024s — the reference's intentional asymmetry with kb/mb/gb/tb, preserved)
  def toKb(x: Column): Column = x * math.pow(1024, -1)
  def toMb(x: Column): Column = x * 1d
  def toGb(x: Column): Column = x * 1024d
  def toTb(x: Column): Column = x * (1024d * 1024d)

  /** User wildcard pattern -> SQL LIKE pattern (`SQLUtil.py:174-197`,
    * `API/Util.py:35-48`): escape `\`, `%`, `_`, then `*`->`%`, `?`->`_`.
    * Pure Scala — runs before the plan is built. */
  def parseWildcardSearch(path: String): String =
    path.trim
      .replace("\\", "\\\\")
      .replace("%", "\\%")
      .replace("_", "\\_")
      .replace("*", "%")
      .replace("?", "_")

  /** Exact-search normalization (`SQLUtil.py:199-212`) = strip trailing slashes. */
  def parseExactSearch(path: String): String =
    stripTrailingSlashesScala(path)

  /** Scala twin of [[stripTrailingSlashes]] (`API/Util.py:163-168`). */
  def stripTrailingSlashesScala(path: String): String =
    path.trim.replaceAll("(?s)([^:])?[\\\\|/]+\\z", "$1")

  /** Scala twin of [[basepath]]. */
  def basepathScala(p: String): String = {
    val stripped = p.replaceAll("(?s)(.)[/\\\\][^/\\\\]+\\z", "$1")
    if (stripped.endsWith(":")) stripped + "\\" else stripped
  }

  /** Scala twin of [[basename]]. */
  def basenameScala(p: String): String = p.replaceAll("(?s)^.+[/\\\\]", "")

  /** Lenient bool parse (`API/Util.py:13-31`): true/t/yes/y/1 -> true, else false. */
  def parseBool(v: String): Boolean =
    Set("true", "t", "yes", "y", "1").contains(v.trim.toLowerCase)

  /** Register SQL names so `spark.sql` queries have parity with the
    * reference's Postgres function names. */
  def registerSql(spark: SparkSession): Unit = {
    spark.udf.register("basepath", (p: String) => if (p == null) null else basepathScala(p))
    spark.udf.register("basename", (p: String) => if (p == null) null else basenameScala(p))
    spark.udf.register("extension", (p: String) =>
      if (p == null) null else p.replaceAll("(?s)^.+\\.", "").toLowerCase)
    spark.udf.register("strip_trailing_slashes", (p: String) =>
      if (p == null) null else stripTrailingSlashesScala(p))
  }
}

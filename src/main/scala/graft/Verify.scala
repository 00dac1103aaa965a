package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Crash/timeout hardening — the artifact must be un-zeroable:
  *   - `oracle_sql.json` (the static map) is written FIRST, before any
  *     query runs — a driver-side time budget that kills the sweep
  *     mid-way still leaves check.py a valid oracle file plus the
  *     partial dumps, scoring a large partial round instead of `{}`.
  *     After the dumps and the dynamic-oracle model training, the file
  *     is atomically re-written with the dynamic entries merged in.
  *   - `verify_progress.json` (JSONL, one timestamped event per line)
  *     is appended through every phase: run start, static oracle,
  *     each fixture build (SparkEntry.prepareFixtures — index builds
  *     and model trainings run BEFORE the sweep, so no dump absorbs
  *     them), each query dump's start/ok/fail, the dynamic oracle,
  *     run done. A timeout at ANY instant leaves the exact phase and
  *     query it hit in the artifact — the r15 driver round died with
  *     `{}` and no way to tell setup from sweep from hang.
  *
  * Query dumps run on a small thread pool (Spark job submission is
  * thread-safe); each dump's `coalesce(1)` write no longer serializes
  * the sweep. `SPARK_GRAFT_FIXTURE_CACHE=<dir>` (iteration-only)
  * reuses the index fixtures across forked re-runs. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape (shared helper): a tab or CR in builder-authored
    // SQL would otherwise make the driver's json.load fail and silently
    // zero the round's correctness.
    def q(s: String): String = graft.core.Json.str(s)
    val progressPath = Paths.get(s"$outDir/verify_progress.json")
    Files.deleteIfExists(progressPath)
    val progressLock = new Object
    def beat(phase: String, name: String, status: String): Unit =
      progressLock.synchronized {
        val line = s"""{"t":"${java.time.Instant.now()}",""" +
          s""""phase":${q(phase)},"name":${q(name)},""" +
          s""""status":${q(status)}}"""
        try Files.writeString(progressPath, line + "\n",
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        catch { case _: Throwable => () } // a beat must never kill a dump
      }
    beat("run", "verify", "start")
    def writeOracle(m: Map[String, String]): Unit = {
      val json = m.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      // Write-then-move: check.py never observes a half-written file.
      val tmp = Paths.get(s"$outDir/oracle_sql.json.tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, Paths.get(s"$outDir/oracle_sql.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    writeOracle(SparkEntry.oracleSql) // before ANY query: un-zeroable gate
    beat("oracle", "static", "written")
    // fixtures (index builds, model trainings) BEFORE the sweep, each
    // heartbeaten — a timeout here is attributable to its named step
    SparkEntry.prepareFixtures(spark, sfDir,
      (name, status) => beat("setup", name, status))
    graft.core.TransientPins.drain(spark) // fixture-build round state
    beat("setup", "fixtures", "done")
    // SPARK_GRAFT_ONLY=q1,q2 restricts the dump for fast iteration; the
    // full oracle_sql.json is still written (check.py runs everything
    // already present in outDir).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val threads = sys.env.getOrElse("SPARK_GRAFT_DUMP_THREADS", "4").toInt
    val pool = Executors.newFixedThreadPool(threads)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            beat("query", name, "start")
            try {
              fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$outDir/$name")
              // release this dump's transient iteration checkpoints —
              // without it the 268-dump sweep accumulates dead round
              // state until GC, squeezing execution memory for every
              // later dump (same measured effect as the bench sweep)
              graft.core.TransientPins.drain(spark)
              beat("query", name, "ok")
            } catch { case e: Throwable =>
              beat("query", name, s"failed: ${e.getMessage}")
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
          }
        })
      }
    pool.shutdown()
    pool.awaitTermination(6, TimeUnit.HOURS)
    beat("oracle", "dynamic", "start")
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle failed: ${e.getMessage}")
        beat("oracle", "dynamic", s"failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    writeOracle(SparkEntry.oracleSql ++ dynamic)
    beat("oracle", "dynamic", "written")
    beat("run", "verify", "done")
    spark.stop()
  }
}

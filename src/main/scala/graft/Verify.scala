package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Crash/timeout hardening: `oracle_sql.json` (the static map) is written
  * FIRST, before any query runs — a driver-side time budget that kills
  * the sweep mid-way still leaves check.py a valid oracle file plus the
  * partial dumps, scoring a large partial round instead of `{}`. After
  * the dumps and the dynamic-oracle model training, the file is
  * atomically re-written with the dynamic entries merged in. Query dumps
  * run on a small thread pool (Spark job submission is thread-safe);
  * each dump's `coalesce(1)` write no longer serializes the sweep. */
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
          def run(): Unit =
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            catch { case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
        })
      }
    pool.shutdown()
    pool.awaitTermination(6, TimeUnit.HOURS)
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    writeOracle(SparkEntry.oracleSql ++ dynamic)
    spark.stop()
  }
}

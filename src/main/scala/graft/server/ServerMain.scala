package graft.server

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.core.StateStore

/** Continuous server loop (§3.2/§3.3 parity with the reference's
  * `Server/__init__.py` process fabric): seed drives, then run
  * crawl + hash rounds on the reference's 5 s flush cadence until
  * interrupted. All stage pools collapse into Spark jobs inside one
  * driver loop; scheduling state lives in `directory_control` exactly as
  * in the reference, so restarts resume where the schedule says.
  *
  * Usage: `runMain graft.server.ServerMain <stateDir> <root> [<root> ...]`
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ServerMain <stateDir> <root> [<root>...]")
    val stateDir = args.head
    val roots = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val state = new StateStore(spark, stateDir)
    val now = () => new Timestamp(System.currentTimeMillis())
    CrawlPipeline.seedDrives(state, roots, now())
    println(s"[server] seeded ${roots.size} roots; entering crawl/hash loop (ctrl-c to stop)")

    val cadenceMs = 5000L // reference queue_timers: Server/__init__.py:48-56
    while (true) {
      val t0 = System.currentTimeMillis()
      val stats = CrawlPipeline.crawlRound(state, now())
      val hashed = CrawlPipeline.hashRound(state, now())
      println(s"[server] round: due=${stats.dueDirs} stagedFiles=${stats.stagedFiles} " +
        s"newDirs=${stats.stagedDirs} missing=${stats.missingDirs} " +
        s"removed=${stats.removedFiles} hashed=$hashed")
      val elapsed = System.currentTimeMillis() - t0
      if (stats.dueDirs == 0 && hashed == 0 && elapsed < cadenceMs)
        Thread.sleep(cadenceMs - elapsed)
    }
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // drop any stale result file up front: a crash mid-run must leave no
    // previous run's numbers where a reader could mistake them for ours
    val outPath = sys.env.getOrElse("BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(outPath))
    catch { case _: Throwable => () }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT/codegen + parquet footer caches, so per-query times
    // measure the query, not session start
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // FULL-scan checksum warm pass per base table: limit(1) only warmed
    // footers, so first-touch data-page reads + scan codegen landed on
    // whichever query the map iterated first — in the round-6 driver
    // bench that was q1_agg, which absorbed ~8 s of one-time cost. One
    // honest scan per table (sum of xxhash64 forces every column) moves
    // that cost into setup, where it belongs.
    def warmScan(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions._
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    }
    // dataset fingerprint alongside the warm pass: per-table row counts
    // make a testdata regeneration visible in the emission itself, so a
    // cross-round per-query delta can be attributed to data-shape change
    // vs container speed vs an actual regression at a glance (round-8
    // lesson: four apparent 4-5x regressions were data+container noise
    // that each cost a plan audit)
    val rowCounts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try {
        val df = graft.core.Tables.table(spark, sfDir, t)
        rowCounts(t) = df.count()
        warmScan(df)
      } catch { case _: Throwable => () }
    }
    // events needs its dedicated reader (nanosecond ts handling) — the
    // generic path throws PARQUET_TYPE_ILLEGAL and leaves it cold
    try {
      val ev = graft.core.Tables.events(spark, sfDir)
      rowCounts("events") = ev.count()
      warmScan(ev)
    } catch { case _: Throwable => () }
    // materialize the cached catalog base tables (the reference's queries
    // hit warm materialized Postgres tables — per-query numbers should
    // measure the query, not the one-time catalog build)
    try {
      val c = SparkEntry.cat(spark, sfDir)
      Seq(c.directory, c.file, c.hash, c.directoryControl, c.hashControl)
        .foreach(_.count())
      // also run each VIEW once: the reference's views are recomputed per
      // query but their PLANS are compiled once by Postgres — Spark's
      // analog is whole-stage codegen compilation, which otherwise lands
      // entirely on whichever catalog query the map iterates first
      Seq(c.vwLl, c.vwFileDetail).foreach(_.count())
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run for local iteration; the
    // driver never sets it, so driver rounds always time the full set
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Drive every query through a checksum sink, not count(): under count()
    // Catalyst prunes unreferenced projections, so a projection-heavy
    // operator (simhash, quantize, chunker) would time its scan instead of
    // its work — the same blindness that hid the HOF-lambda O(L²) trap.
    // xxhash64(struct(*)) forces every output column to be evaluated.
    // The combiner must be bit_xor, NOT sum: summing uniform 64-bit hashes
    // overflows BIGINT almost surely, and under ANSI that THROWS — the
    // catch below would swallow it and record time-to-first-overflow,
    // silently truncating whatever tail of the final stage hadn't run
    // (measured: even q1_agg's 6-row checksum overflowed). XOR is total,
    // order-independent, and still forces every column.
    // Returns the OUTPUT ROW COUNT alongside forcing the checksum: for
    // output-bound queries (j16's ~10M materialized pairs) the row count
    // is the cost driver, and without it in the emission a cross-round
    // swing on unchanged code is unattributable (round-9 lesson: j16
    // doubled and the regenerated-data pair-count that explained it was
    // nowhere in the artifacts). count(1) rides the same single-pass
    // aggregate — no second evaluation.
    def checksum(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.functions._
      val r = df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)"), count(lit(1))).collect()
      if (r.nonEmpty && !r(0).isNullAt(1)) r(0).getLong(1) else 0L
    }
    // container-speed calibration: a FIXED synthetic workload (data-
    // independent: generate → hash → shuffle → aggregate, the same ops
    // the query set leans on) timed after warm-up. Cross-round per-query
    // comparisons divide by this first: a calib swing is the container,
    // not the code (round 8 ran ~1.5x slower than the builder's machine
    // and made four clean plans look like regressions).
    def cpuCalib(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(20000000L)
        .select((org.apache.spark.sql.functions.col("id") % 4096L).as("k"),
          xxhash64(org.apache.spark.sql.functions.col("id")).as("h"))
        .groupBy("k").agg(expr("bit_xor(h) AS x"))
        .agg(expr("bit_xor(x)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // SECOND calibration axis — allocation/codec-heavy (string build →
    // repeat → encode → digest): the ops the multimodal/digest family
    // (x61/x62/x66) leans on. The r15 driver container was degraded in
    // a mode the CPU-shuffle calib read as only 1.42x while codec-heavy
    // queries ran 7-25x — with this axis IN the artifact, that round
    // would have been attributable without a judge counter-bench.
    def allocCalib(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(1500000L)
        .select(sha1(encode(repeat(
          md5(org.apache.spark.sql.functions.col("id").cast("string")), 8),
          "utf-8")).as("d"))
        .agg(expr("bit_xor(xxhash64(d))")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // `calib` stays the COLD first reading — its meaning is pinned by
    // 15 rounds of cross-round adjusted-seconds comparisons (adjusted =
    // raw / calib); silently warming it would shrink the denominator
    // ~4x and make every r16 number read as a regression. The WARM
    // re-reads (steady-state, the calib queries' own codegen paid) are
    // what the MID-SWEEP readings compare against for the detachment
    // check: |calib_mid / calib_warm - 1| >> noise means the container
    // changed speed DURING the sweep.
    val calib = cpuCalib()
    val calibAlloc = allocCalib()
    val calibWarm = cpuCalib()
    val calibAllocWarm = allocCalib()
    // sorted-name iteration: SparkEntry.queries is a hash Map, so its
    // iteration order — and therefore which query pays any residual
    // first-touch cost — used to vary with the key set. Deterministic
    // order makes per-query numbers comparable across rounds.
    // best-of-N (default 2): a single execution is hostage to container
    // swing — the round-10 driver bench recorded 4× on queries whose
    // code was byte-identical to a 2.6 s local run. The reported number
    // is the MIN over N back-to-back executions: steady-state, the same
    // warm-cache footing for every query, and the quantity a cross-round
    // comparison can actually attribute to code. Wall-clock cost is ~N×
    // the reported total; the driver's budget covers it at sf0.1.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
      .max(1)
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // MID-SWEEP calibration re-read (both axes): a container that
    // degrades DURING the sweep — the r15 driver shape — shows up as
    // calib_mid detaching from calib, attributable inside the artifact
    var calibMid = -1.0
    var calibAllocMid = -1.0
    val resultsFull = qlist.zipWithIndex
      .map { case ((name, fn), i) =>
        if (qlist.size > 1 && i == qlist.size / 2) {
          calibMid = cpuCalib(); calibAllocMid = allocCalib()
        }
        spark.sparkContext.setJobDescription(name)
        val runs = (1 to rounds).map { _ =>
          val t0 = System.nanoTime()
          val outRows = try checksum(fn(spark, sfDir))
            catch { case _: Throwable => -1L } // -1 = errored, not empty
          val dt = (System.nanoTime() - t0) / 1e9
          // release the round's transient iteration checkpoints NOW —
          // outside the timed window, deterministically. Without this the
          // sweep accumulates every query's dead round-state blocks until
          // GC notices, storage squeezes execution, and LATER queries pay
          // (measured: x45 4.12 s mid-sweep vs 0.35 s isolated; the
          // mid-sweep calib detached 2.3x from warm). The drain releases
          // only per-invocation pins (TransientPins contract) — the
          // session-scoped PinnedViews/catalog caches, whose reuse IS the
          // measured semantics, are untouched.
          graft.core.TransientPins.drain(spark)
          (dt, outRows)
        }
        spark.sparkContext.setJobDescription(null)
        // prefer successful runs: a fast-failing round must not shadow a
        // slower round that succeeded (an intermittent failure would
        // otherwise report out_rows -1 with a misleadingly quick time)
        val ok = runs.filter(_._2 != -1L)
        val best = (if (ok.nonEmpty) ok else runs).minBy(_._1)
        // run 1's wall time rides alongside best-of-N (additions-only,
        // round-19): queries that derive a session-memoized relation
        // (PinnedViews — the graph family's pair relation, the dedup
        // contraction kernels) pay the derivation exactly once, in run 1
        // of the FIRST sharing query; min() then reports memo-warm time
        // for that query and every later sharer. first_run is the
        // cold-side reading that makes the amortization visible in the
        // artifact instead of under-pricing six queries silently.
        (name, best._1, best._2, runs.head._1)
      }
    val results = resultsFull.map { case (n, s, _, _) => (n, s) }
    // 3-decimal timings: the driver captures a bounded tail of stdout and
    // parses the last JSON line — full-precision doubles push the line past
    // that window (BENCH_r01/r02 recorded parsed:null). Locale.ROOT keeps
    // the decimal separator a dot on comma-locale JVMs.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qJson(rs: Iterable[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // a SPARK_GRAFT_ONLY-restricted local run must be distinguishable from
    // the full bench to any later reader: flag it in every emission
    val restricted = if (only.isDefined) """"restricted":true,""" else ""
    // shared JSON escaper for the embedded env-controlled paths
    def jq(s: String): String = graft.core.Json.escape(s)
    val rowsJson = rowCounts
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // out_rows: per-query OUTPUT row counts — the third attribution axis
    // (rows = input data shape, calib = container speed, out_rows =
    // result volume for output-bound queries); -1 marks a query that
    // threw rather than one that returned empty
    val outRowsJson = resultsFull
      .map { case (k, _, r, _) => "\"" + k + "\":" + r }.mkString("{", ",", "}")
    // first_run: run 1's seconds per query (see resultsFull) — the
    // cold-side price of anything session-memoized; "queries" stays
    // best-of-N so every existing consumer/comparison is untouched
    val firstRunJson = resultsFull
      .map { case (k, _, _, f) => "\"" + k + "\":" + fmt(f) }
      .mkString("{", ",", "}")
    // mid-sweep readings that never ran (<=2-query sweep) emit as JSON
    // null, not a -1.0 sentinel: a consumer computing the documented
    // detachment ratio |calib_mid/calib_warm - 1| must see "absent", not
    // a nonsense negative reading. Compare the EXACT sentinel — the
    // alloc delta can in principle read genuinely negative (GC between
    // the two MX readings), and that is a measurement to report, not
    // an absence to hide
    def fmtOpt(v: Double): String = if (v == -1.0) "null" else fmt(v)
    val calibs = s""""calib":${fmt(calib)},""" +
      s""""calib_alloc":${fmt(calibAlloc)},""" +
      s""""calib_warm":${fmt(calibWarm)},""" +
      s""""calib_alloc_warm":${fmt(calibAllocWarm)},""" +
      s""""calib_mid":${fmtOpt(calibMid)},""" +
      s""""calib_alloc_mid":${fmtOpt(calibAllocMid)},"""
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      restricted + calibs + s""""runs":$rounds,""" +
      s""""rows":$rowsJson,""" +
      s""""queries":${qJson(results)},"out_rows":$outRowsJson,""" +
      s""""first_run":$firstRunJson,""" +
      s""""sf":"${jq(sfDir)}"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    println(full)
    // The driver parses the last JSON line of a bounded (2 KiB) stdout
    // tail. The full per-query line above is ~2.2 KiB at 85 queries — it
    // can never sit whole inside the window — so emit a final COMPACT
    // line (slowest queries first, capped well under the window) that
    // parses even after the full line's head is truncated away; the
    // complete map lives in the line above and in BENCH_OUT. build.sbt
    // sets `showSuccess := false` so no sbt trailer lands after this.
    val slowest = results.toSeq.sortBy(-_._2)
    // budget the whole line against the 2000-char window, measured in
    // UTF-8 BYTES (the driver tails a byte stream — a multi-byte path
    // char counts more than once); fixed fields incl. the ESCAPED paths
    // come off the top
    def bytes(s: String): Int = s.getBytes("UTF-8").length
    val fixed = 180 + calibs.length +
      bytes(jq(outPath)) + bytes(jq(sfDir)) + restricted.length
    val budget = 1800 - fixed // bytes for the queries map
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 2
    slowest.foreach { case (k, v) =>
      val w = bytes(k) + fmt(v).length + 4
      if (used + w <= budget) { kept += ((k, v)); used += w }
    }
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      restricted + calibs + s""""runs":$rounds,""" +
      s""""queries_total":${results.size},"queries_shown":${kept.size},""" +
      s""""full":"${jq(outPath)}","queries":${qJson(kept)},"sf":"${jq(sfDir)}"}"""
    println(compact)
    spark.stop()
  }
}

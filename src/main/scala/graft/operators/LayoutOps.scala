package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout planning — the write-side half of scan performance. At
  * warehouse scale the cheapest predicate is the one that never reads a
  * file: parquet row-group zone maps (per-file min/max) prune scans only
  * as well as the LAYOUT clusters the filter columns. Sorting by one key
  * gives perfect pruning on that key and none on any other; Z-ORDER
  * (Morton-curve) clustering interleaves the key bits so BOTH dimensions
  * cluster at ~√files resolution — the standard trade (Delta/Iceberg
  * OPTIMIZE ZORDER, the Hudi space-curve writers) and the right one for
  * a corpus queried by more than one selective column.
  *
  * [[zoneMapAudit]] MEASURES that trade instead of asserting it: it
  * simulates both layouts over the same relation and reports each
  * output file's zone map plus its per-dimension span coverage — the
  * exact fraction of a dimension's value range a point filter on that
  * dimension must scan. Linear layout: cov_a ≈ 1/files, cov_b ≈ 1.
  * Z-order: both ≈ √(1/files). The audit is what a table maintenance
  * job reads before choosing a rewrite policy.
  *
  * Scale shape: one pass for the 1-row min/max stats (broadcast back),
  * one global sort per layout — exactly the range-partitioned sort a
  * real OPTIMIZE write performs, so the audit's cost model IS the
  * rewrite's — and a files-sized zone-map aggregate. Everything is
  * exact integer arithmetic (16-bit scaling, shift/mask interleave,
  * ppm spans by floor division).
  */
object LayoutOps {

  /** Morton spread: 16-bit value → its bits at even positions of a
    * 32-bit word (the classic 4-step mask ladder). */
  private def spread(c: Column): Column = {
    val s1 = shiftleft(c, 8).bitwiseOR(c).bitwiseAND(lit(0x00FF00FFL))
    val s2 = shiftleft(s1, 4).bitwiseOR(s1).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = shiftleft(s2, 2).bitwiseOR(s2).bitwiseAND(lit(0x33333333L))
    shiftleft(s3, 1).bitwiseOR(s3).bitwiseAND(lit(0x55555555L))
  }

  /** The same ladder over a SQL expression (DuckDB syntax). */
  private def spreadSql(e: String): String = {
    val s1 = s"((($e << 8) | $e) & 16711935)"
    val s2 = s"((($s1 << 4) | $s1) & 252645135)"
    val s3 = s"((($s2 << 2) | $s2) & 858993459)"
    s"((($s3 << 1) | $s3) & 1431655765)"
  }

  /** Zone-map audit of linear-vs-Z-order layout over (`dimA`, `dimB`):
    * both dims scale to 16-bit grid cells against their observed range,
    * rows are laid into `files` equal files by each layout's sort key
    * (exact ntile semantics over (key, tiebreak) — `tieCols` must
    * uniquely identify a row or the layout is not reproducible), and
    * each file reports its zone map and per-dim span coverage in ppm of
    * the global range.
    *
    * The file assignment needs each row's EXACT rank within its layout,
    * but `layout` has two values — a window partitioned on it alone
    * sorts the whole exploded fact in two tasks. [[TwoPhase.prefixed]]
    * supplies the ranks scalably instead: the sort key's range is known
    * by construction (ua ∈ [0, 65535], z ∈ [0, 2³²)), so each layout
    * equi-width-buckets deterministically, per-bucket counts broadcast
    * back as prefix offsets, and rank = offset + within-bucket row
    * number — per-task input is one grid bucket, never one layout. The
    * rank then maps to ntile's tile arithmetic in closed form, so the
    * output (and the DuckDB ntile twin) is bit-identical to the
    * single-window form at any scale.
    *
    * Output: (layout ∈ {linear_a, zorder}, file_id, n_rows, min_a,
    * max_a, min_b, max_b, cov_a_ppm, cov_b_ppm). */
  def zoneMapAudit(df: DataFrame, dimA: Column, dimB: Column,
                   tieCols: Seq[Column], files: Int = 16,
                   buckets: Int = 64,
                   state: DedupOps.IterState = DedupOps.Local): DataFrame = {
    require(files >= 2 && files <= 4096, s"files=$files")
    val base = df.select((dimA.cast("long").as("a") +: dimB.cast("long").as("b") +:
      tieCols.zipWithIndex.map { case (c, i) => c.as(s"t$i") }): _*)
    val stats = base.agg(min(col("a")).as("ga0"), max(col("a")).as("ga1"),
      min(col("b")).as("gb0"), max(col("b")).as("gb1"),
      count(lit(1)).as("gn"))
    // the scaled/Morton-keyed fact is consumed THREE times downstream
    // (TwoPhase's bucket-count pass, its rank pass, and the final
    // audit columns) — pinned per invocation (round 19, guide §2.1/§6)
    // it is evaluated ONCE: one stats scan + one keyed scan of the
    // fact instead of three scans each re-running the crossJoin and
    // the 8-step spread ladder. The pin is the NARROW key relation
    // (two dims + grid keys + tiebreak), the same materialize-once a
    // real OPTIMIZE rewrite performs before laying files out.
    val scaled = state.pin(base.crossJoin(broadcast(stats))
      .select(col("a"), col("b"), col("ga0"), col("ga1"), col("gb0"), col("gb1"), col("gn"),
        expr("((a - ga0) * 65535L) div greatest(ga1 - ga0, 1L)").as("ua"),
        expr("((b - gb0) * 65535L) div greatest(gb1 - gb0, 1L)").as("ub"),
        struct(tieCols.indices.map(i => col(s"t$i")): _*).as("tie"))
      .withColumn("z", shiftleft(spread(col("ua")), 1).bitwiseOR(spread(col("ub")))))
    // both layouts from one explode of a layout tag (a union of two
    // globally-sorted branches would read the fact once per branch);
    // exact per-layout ranks via TwoPhase — the linear key lives on the
    // 16-bit grid, the Morton key on the 32-bit grid, so the equi-width
    // bucket is a pure shift of the key, no sampled boundaries anywhere
    val exploded = scaled
      .select(col("a"), col("b"), col("ga0"), col("ga1"), col("gb0"),
        col("gb1"), col("gn"), col("ua"), col("z"), col("tie"),
        explode(array(lit("linear_a"), lit("zorder"))).as("layout"))
      .withColumn("key",
        when(col("layout") === "linear_a", col("ua")).otherwise(col("z")))
    // per-layout totals are just gn (each layout holds every base row),
    // already broadcast from the stats scan — totals=false spares
    // TwoPhase a third evaluation of the fact
    val ranked = TwoPhase.prefixed(exploded,
      partCols = Seq("layout"),
      bucketCol = when(col("layout") === "linear_a",
        expr(s"(ua * ${buckets}L) div 65536L"))
        .otherwise(expr(s"(z * ${buckets}L) div 4294967296L")),
      orderCols = Seq(col("key"), col("tie")),
      sums = Seq("rn" -> lit(1L)), totals = false)
    // ntile(files) in closed form from (rank, n): q = n div files,
    // r = n mod files — tiles 1..r hold q+1 rows, tiles r+1..files hold
    // q (greatest(q,1) guards the n < files edge, where the first
    // branch always applies)
    val laid = ranked
      .withColumn("file_id", expr(
        s"""CASE WHEN rn_pre <= (gn % ${files}L) * (gn div ${files}L + 1L)
           |  THEN (rn_pre - 1L) div (gn div ${files}L + 1L) + 1L
           |  ELSE (gn % ${files}L)
           |    + (rn_pre - 1L - (gn % ${files}L) * (gn div ${files}L + 1L))
           |      div greatest(gn div ${files}L, 1L) + 1L
           |END""".stripMargin))
    laid
      .groupBy("layout", "file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"),
        first(col("ga0")).as("ga0"), first(col("ga1")).as("ga1"),
        first(col("gb0")).as("gb0"), first(col("gb1")).as("gb1"))
      .select(col("layout"), col("file_id"), col("n_rows"),
        col("min_a"), col("max_a"), col("min_b"), col("max_b"),
        expr("((max_a - min_a + 1L) * 1000000L) div (ga1 - ga0 + 1L)")
          .as("cov_a_ppm"),
        expr("((max_b - min_b + 1L) * 1000000L) div (gb1 - gb0 + 1L)")
          .as("cov_b_ppm"))
  }

  /** The write path the audit simulates: rewrite `df` as `files` parquet
    * files in Z-order on (`dimA`, `dimB`) — repartitionByRange on the
    * Morton key (the same range-shuffle a Delta/Iceberg OPTIMIZE ZORDER
    * performs), sortWithinPartitions for row-group locality, one file
    * per range partition. After this write, a reader's min/max zone maps
    * prune BOTH dimensions at ~√(1/files) — LayoutOpsSpec proves it by
    * reading the files back individually (`input_file_name`) and
    * checking the physical per-file spans against [[zoneMapAudit]]'s
    * simulated `zorder` rows.
    *
    * The z key is dropped before writing — it is layout, not data.
    *
    * Exactly-once commit (the writeShards protocol): the layout lands
    * in `path/.staging` first, then publishes as a version under
    * `path` via [[graft.core.AtomicDir]] — a crash at ANY point leaves
    * the previously-published layout fully readable at
    * [[currentZOrdered]], at worst an orphaned staging dir the next
    * run's overwrite reclaims. Returns the published version path. */
  def writeZOrdered(df: DataFrame, dimA: Column, dimB: Column,
                    path: String, files: Int = 16): String = {
    require(files >= 1 && files <= 4096, s"files=$files")
    val base = df.withColumn("__a", dimA.cast("long"))
      .withColumn("__b", dimB.cast("long"))
    val stats = base.agg(min(col("__a")).as("ga0"), max(col("__a")).as("ga1"),
      min(col("__b")).as("gb0"), max(col("__b")).as("gb1"))
    base.crossJoin(broadcast(stats))
      .withColumn("__ua",
        expr("((__a - ga0) * 65535L) div greatest(ga1 - ga0, 1L)"))
      .withColumn("__ub",
        expr("((__b - gb0) * 65535L) div greatest(gb1 - gb0, 1L)"))
      .withColumn("__z",
        shiftleft(spread(col("__ua")), 1).bitwiseOR(spread(col("__ub"))))
      .drop("ga0", "ga1", "gb0", "gb1", "__a", "__b", "__ua", "__ub")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(s"$path/.staging")
    graft.core.AtomicDir.promote(path, s"$path/.staging")
  }

  /** The live Z-ordered layout under `path` — what readers open. */
  def currentZOrdered(path: String): String =
    graft.core.AtomicDir.current(path)

  /** DuckDB twin of [[zoneMapAudit]]: `rel` with dim expressions
    * `dimA`/`dimB` and a unique tiebreak ORDER BY tail `tie`. */
  def zoneMapAuditSql(rel: String, dimA: String, dimB: String,
                      tie: String, files: Int = 16): String =
    s"""WITH zm_base AS (
       |  SELECT CAST($dimA AS BIGINT) AS a, CAST($dimB AS BIGINT) AS b, r.*
       |  FROM $rel r
       |), zm_stats AS (
       |  SELECT min(a) AS ga0, max(a) AS ga1, min(b) AS gb0, max(b) AS gb1
       |  FROM zm_base
       |), zm_scaled AS (
       |  SELECT *,
       |    ((a - ga0) * 65535) // greatest(ga1 - ga0, 1) AS ua,
       |    ((b - gb0) * 65535) // greatest(gb1 - gb0, 1) AS ub
       |  FROM zm_base CROSS JOIN zm_stats
       |), zm_z AS (
       |  SELECT *, (${spreadSql("ua")} << 1) | ${spreadSql("ub")} AS z
       |  FROM zm_scaled
       |), zm_laid AS (
       |  SELECT layout,
       |    ntile($files) OVER (PARTITION BY layout
       |      ORDER BY CASE WHEN layout = 'linear_a' THEN ua ELSE z END,
       |        $tie) AS file_id, *
       |  FROM zm_z, (VALUES ('linear_a'), ('zorder')) AS lt(layout)
       |)
       |SELECT layout, CAST(file_id AS BIGINT) AS file_id,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  min(a) AS min_a, max(a) AS max_a, min(b) AS min_b, max(b) AS max_b,
       |  CAST(((max(a) - min(a) + 1) * 1000000) // (any_value(ga1) - any_value(ga0) + 1)
       |    AS BIGINT) AS cov_a_ppm,
       |  CAST(((max(b) - min(b) + 1) * 1000000) // (any_value(gb1) - any_value(gb0) + 1)
       |    AS BIGINT) AS cov_b_ppm
       |FROM zm_laid
       |GROUP BY layout, file_id""".stripMargin
}

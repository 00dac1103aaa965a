package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase prefix aggregation — the scale-safe replacement for a
  * window over a LOW-CARDINALITY partition key of a corpus-sized
  * relation.
  *
  * `Window.partitionBy(k).orderBy(o)` hash-partitions the WHOLE input
  * on `k`; when `k` has a handful of values (a 2-value layout tag, a
  * few languages, a dozen event types) the entire fact lands in a
  * handful of tasks, each doing a full sort — correct at any SF,
  * catastrophic at 100 TB. The fix is the same decomposition a
  * distributed sort uses: split each logical partition into many
  * DETERMINISTIC order-aligned buckets, aggregate once per bucket,
  * turn the bucket aggregates (a `|parts|×B`-sized relation) into
  * exclusive prefix offsets, broadcast them back, and finish each
  * bucket independently — prefix(row) = offset(bucket) ⊕ prefix
  * within the bucket. One bounded-size sort per (partition, bucket)
  * task, never a partition-sized one.
  *
  * The bucket expression MUST be (a) deterministic — it is evaluated
  * independently on the aggregate branch and the main branch, so a
  * sampled `repartitionByRange` boundary would silently disagree
  * between the two — and (b) weakly monotone in the `orderCols`
  * ordering (rows earlier in the order never get a larger bucket),
  * or the offsets compose with the wrong buckets. Equi-width over a
  * known or 1-row-aggregated key range satisfies both; balance then
  * tracks the key distribution, so callers spread heavy ties with an
  * order-preserving composite key (see
  * [[graft.operators.TextOps.sampleQuantileCalibration]]).
  *
  * Cost model: 2 scans of `df` (bucket aggregates + main), one
  * map-side-combined aggregate exchange (tiny after partials), one
  * hash exchange of the fact on (partCols, bucket) — `|parts|·B`
  * keys, each task bounded by its bucket — and a broadcast join of
  * the `|parts|×B` offset relation. No window anywhere partitions on
  * `partCols` alone, including over the offset relation (its totals
  * come from a second tiny aggregate, not a partition-total window).
  *
  * Measures:
  *  - `sums`: (name, expr) → `name_pre` = INCLUSIVE running sum over
  *    `orderCols` within the partition, `name_tot` = partition total.
  *    `row_number` = a `lit(1L)` sum's `_pre`.
  *  - `maxes`: (name, expr) → `name_prior` = EXCLUSIVE running max
  *    (max over all strictly-earlier rows; null on each partition's
  *    first row) — the running-high-watermark shape.
  *
  * All measures are cast to long (the repo's exact-integer
  * convention). `orderCols` must totally order rows within a
  * partition (unique tiebreak) or running sums are nondeterministic.
  */
object TwoPhase {

  /** Deterministic equi-width bucket as a SQL fragment: `key` in
    * `[kmin, kmax]` → one of `b` buckets (long floor division, the
    * repo's `expr("… div …")` convention). Caller guarantees
    * `(kmax-kmin+1)·b` fits a BIGINT. Degenerate range → bucket 0. */
  def equiWidthBucketSql(key: String, kmin: String, kmax: String, b: Int): Column =
    expr(s"(($key - $kmin) * ${b}L) div greatest($kmax - $kmin + 1L, 1L)")

  /** `totals = false` skips the `name_tot` columns AND their extra
    * aggregate branch — callers that already know the partition totals
    * (e.g. from a 1-row stats scan they broadcast anyway) avoid a third
    * evaluation of `df` that way. */
  def prefixed(df: DataFrame, partCols: Seq[String], bucketCol: Column,
               orderCols: Seq[Column],
               sums: Seq[(String, Column)] = Nil,
               maxes: Seq[(String, Column)] = Nil,
               totals: Boolean = true): DataFrame = {
    require(sums.nonEmpty || maxes.nonEmpty, "at least one measure")
    val pc = partCols.map(col)
    val base0 = df.withColumn("__bk", bucketCol.cast("long"))
    val base = (sums.map { case (n, c) => s"__v_$n" -> c } ++
      maxes.map { case (n, c) => s"__w_$n" -> c })
      .foldLeft(base0) { case (d, (nm, c)) => d.withColumn(nm, c.cast("long")) }

    // phase 1: one aggregate row per (partition, bucket) — map-side
    // partials make the exchange |tasks|·|parts|·B-bounded
    val aggs = sums.map { case (n, _) => sum(col(s"__v_$n")).as(s"__s_$n") } ++
      maxes.map { case (n, _) => max(col(s"__w_$n")).as(s"__m_$n") }
    val perBucket = base.groupBy(pc :+ col("__bk"): _*).agg(aggs.head, aggs.tail: _*)

    // exclusive prefix over the bucket axis — a window over the TINY
    // aggregate, partitioned by (partCols, ordered by bucket)
    val wPrev = Window.partitionBy(pc: _*).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perBucket.select(
      (pc :+ col("__bk")) ++
        sums.map { case (n, _) =>
          coalesce(sum(col(s"__s_$n")).over(wPrev), lit(0L)).as(s"__off_$n") } ++
        maxes.map { case (n, _) =>
          max(col(s"__m_$n")).over(wPrev).as(s"__pm_$n") }: _*)
    val side =
      if (sums.isEmpty || !totals) offs
      else {
        val tAggs = sums.map { case (n, _) => sum(col(s"__s_$n")).as(s"${n}_tot") }
        val tots = perBucket.groupBy(pc: _*).agg(tAggs.head, tAggs.tail: _*)
        // empty partCols → tots is ONE global row; an explicit broadcast
        // crossJoin plans as the Cross-tagged 1-row stats join the plan
        // lint allows, where join(_, Seq.empty) would plan a
        // condition-less Inner BNLJ
        if (partCols.isEmpty) offs.crossJoin(broadcast(tots))
        else offs.join(tots, partCols)
      }

    // phase 2: finish each (partition, bucket) independently — the only
    // fact-sized exchange, keyed on |parts|·B values
    val wIn = Window.partitionBy(pc :+ col("__bk"): _*).orderBy(orderCols: _*)
    val joined = base.join(broadcast(side), partCols :+ "__bk")
    val withPre = sums.foldLeft(joined) { case (d, (n, _)) =>
      d.withColumn(s"${n}_pre", col(s"__off_$n") + sum(col(s"__v_$n"))
        .over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    val withPrior = maxes.foldLeft(withPre) { case (d, (n, _)) =>
      // greatest skips nulls: first bucket has no __pm, first row of a
      // bucket has no within-bucket prior — null only when both are
      d.withColumn(s"${n}_prior", greatest(col(s"__pm_$n"), max(col(s"__w_$n"))
        .over(wIn.rowsBetween(Window.unboundedPreceding, -1))))
    }
    val internal = Seq("__bk") ++
      sums.flatMap { case (n, _) => Seq(s"__v_$n", s"__off_$n") } ++
      maxes.flatMap { case (n, _) => Seq(s"__w_$n", s"__pm_$n") }
    withPrior.drop(internal: _*)
  }
}

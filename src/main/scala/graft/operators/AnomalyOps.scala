package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream anomaly reads — the monitoring queries a pipeline runs
  * over its own telemetry before trusting a day's ingest (the x103
  * mixture-monitor convention: aggregate-sized state, exact integer
  * verdicts).
  *
  * Burst detection compares each hour's event count against its own
  * trailing window. The hour grid is DENSIFIED per type (explode of the
  * type's [min, max] hour range) so the ROWS frame really is "the
  * previous `trailing` wall-clock hours" — on the raw aggregate a ROWS
  * frame silently skips quiet hours and a sparse type's baseline
  * telescopes arbitrarily far back, understating bursts exactly where
  * they matter most.
  *
  * Scale shape: one shuffle to the (type, hour) aggregate — the relation
  * is |types|×|hours| from then on, however many raw events fed it — and
  * one window partitioned by type over that grid. The burst test is an
  * exact integer cross-multiply (cnt·n ≥ x·sum), no float thresholds.
  */
object AnomalyOps {

  /** Top-`topK` hourly bursts per event type: hours whose count is at
    * least `thresholdX`× their trailing-`trailing`-hour mean, with at
    * least `minBaseline` hours of history in the frame (the cold-start
    * guard — a 2nd-hour "burst" over a 1-hour baseline is noise).
    *
    * Output: (event_type, hour_epoch, n_events, base_n, base_sum,
    * ratio_ppm), ratio_ppm = cnt·base_n·10⁶ div base_sum — exact
    * integers end to end, ties broken by (event_type, hour_epoch). */
  def burstReport(events: DataFrame, trailing: Int = 24,
                  thresholdX: Int = 3, minBaseline: Int = 12,
                  topK: Int = 20): DataFrame =
    burstsFromHourly(hourlyCounts(events), trailing, thresholdX,
      minBaseline, topK)

  /** The live half: (event_type, hour_epoch, cnt). A plain sum-shaped
    * streaming aggregation — [[graft.streaming.AnomalyStream]] maintains
    * exactly this relation online; the verdict below is computed ON READ
    * (trailing-window functions are not stream-legal, and should not
    * be — the baseline re-reads 24 rows of bounded state, not the
    * event stream). */
  def hourlyCounts(events: DataFrame): DataFrame = events
    .select(col("event_type"),
      expr("unix_timestamp(ts) div 3600L").as("hour_epoch"))
    .groupBy("event_type", "hour_epoch")
    .agg(count(lit(1)).as("cnt"))

  /** The verdict half over a (live or batch) hourly-count table. */
  def burstsFromHourly(hourly: DataFrame, trailing: Int = 24,
                       thresholdX: Int = 3, minBaseline: Int = 12,
                       topK: Int = 20): DataFrame = {
    require(trailing >= 2 && minBaseline >= 1 && minBaseline <= trailing &&
      thresholdX >= 1, s"trailing=$trailing min=$minBaseline x=$thresholdX")
    // dense per-type hour grid: quiet hours are real zero observations.
    // The grid branch RENAMES its columns — it re-reads `hourly`, and a
    // same-name self-join over an external view (e.g. the streaming
    // memory sink twin) hits conflicting-attribute resolution (the
    // SketchOps.estimateFromRegisters lesson)
    val grid = hourly.groupBy("event_type")
      .agg(min(col("hour_epoch")).as("h_min"), max(col("hour_epoch")).as("h_max"))
      .select(col("event_type").as("g_type"),
        explode(sequence(col("h_min"), col("h_max"))).as("g_hour"))
    val dense = grid.join(hourly,
        col("g_type") === col("event_type") && col("g_hour") === col("hour_epoch"),
        "left_outer")
      .select(col("g_type").as("event_type"), col("g_hour").as("hour_epoch"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("hour_epoch")
      .rowsBetween(-trailing, -1)
    dense
      .withColumn("base_sum", sum(col("cnt")).over(w))
      .withColumn("base_n", count(col("cnt")).over(w))
      .filter(col("base_n") >= minBaseline && col("base_sum") > 0L &&
        col("cnt") * col("base_n") >= lit(thresholdX.toLong) * col("base_sum"))
      .select(col("event_type"), col("hour_epoch"),
        col("cnt").as("n_events"), col("base_n"), col("base_sum"),
        expr("(cnt * base_n * 1000000L) div base_sum").as("ratio_ppm"))
      .orderBy(col("ratio_ppm").desc, col("event_type"), col("hour_epoch"))
      .limit(topK)
  }

  /** DuckDB twin of [[burstReport]]. */
  def burstReportSql(trailing: Int = 24, thresholdX: Int = 3,
                     minBaseline: Int = 12, topK: Int = 20): String =
    s"""WITH br_hourly AS (
       |  SELECT event_type,
       |    CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_epoch,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2
       |), br_grid AS (
       |  SELECT event_type, unnest(range(h_min, h_max + 1)) AS hour_epoch
       |  FROM (SELECT event_type, min(hour_epoch) AS h_min,
       |          max(hour_epoch) AS h_max
       |        FROM br_hourly GROUP BY 1)
       |), br_dense AS (
       |  SELECT g.event_type, g.hour_epoch, COALESCE(h.cnt, 0) AS cnt
       |  FROM br_grid g LEFT JOIN br_hourly h
       |    ON h.event_type = g.event_type AND h.hour_epoch = g.hour_epoch
       |), br_win AS (
       |  SELECT event_type, hour_epoch, cnt,
       |    sum(cnt) OVER tw AS base_sum,
       |    count(cnt) OVER tw AS base_n
       |  FROM br_dense
       |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour_epoch
       |    ROWS BETWEEN $trailing PRECEDING AND 1 PRECEDING)
       |)
       |SELECT event_type, hour_epoch, cnt AS n_events,
       |  CAST(base_n AS BIGINT) AS base_n, CAST(base_sum AS BIGINT) AS base_sum,
       |  CAST((cnt * base_n * 1000000) // base_sum AS BIGINT) AS ratio_ppm
       |FROM br_win
       |WHERE base_n >= $minBaseline AND base_sum > 0
       |  AND cnt * base_n >= $thresholdX * base_sum
       |ORDER BY ratio_ppm DESC, event_type, hour_epoch
       |LIMIT $topK""".stripMargin
}

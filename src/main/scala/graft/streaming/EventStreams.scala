package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time processing over the `events` table — watermarked windowed
  * aggregation and stateful sessionization, usable identically in batch
  * (for the correctness oracle) and as Structured Streaming transforms
  * (`readStream` the same relation and reuse these functions unchanged).
  *
  * Beyond-reference surface: the reference has no event-time semantics
  * (SURVEY §2.9 "no watermarks needed") — these operators extend the
  * engine toward the streaming side of a training-data pipeline
  * (event logs, interaction streams).
  *
  * Scale: tumbling windows aggregate with partial map-side combine on
  * (window, event_type); the shuffle key cardinality is bounded by
  * |windows|×|types|, so this holds at any input volume. Values are cast
  * to DECIMAL per-row pre-SUM (order-independent, engine-exact).
  */
object EventStreams {

  /** Tumbling-window aggregate: per (hour, event_type) — count, distinct
    * users, exact decimal value sum. Deliberately a TWO-PHASE aggregation
    * (per-user partial, then a chained window re-aggregation through
    * `window_time`): batch results are identical to a `countDistinct`
    * formulation — and it's exactly the shape Catalyst expands distinct
    * aggregates into, so it costs the same — but unlike `countDistinct`
    * it is legal in Structured Streaming (chained windowed aggregations,
    * Spark ≥3.4). In streaming mode add `.withWatermark("ts", "1 hour")`
    * upstream; the transform is reused unchanged (EventStreamsSpec). */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        // DECIMAL inside the SUMs (order-independent), DOUBLE projected out
        // (engine-portable hashing; exact for these magnitudes)
        sum(col("value").cast(DecimalType(18, 6))).as("v"))
      .groupBy(window(window_time(col("w")), "1 hour").as("w2"), col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        // count(user_id), not count(*): the NULL-user group from phase 1
        // must not count as a user — count(DISTINCT user_id) ignores NULLs
        count(col("user_id")).as("n_users"),
        sum(col("v")).cast("double").as("sum_value"))
      .select(col("w2.start").as("ts_hour"), col("event_type"),
        col("n_events"), col("n_users"), col("sum_value"))

  def hourlyByTypeSql: String =
    """SELECT date_trunc('hour', ts) AS ts_hour, event_type,
      |  count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Per-user sessionization with a fixed inactivity gap: window function
    * formulation (lag + cumulative session counter) so the SAME semantics
    * run in batch and in the oracle; the streaming twin is
    * `session_window(ts, gap)` / `flatMapGroupsWithState`. Returns one row
    * per session. */
  def userSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        // second precision: raw ns timestamps must not be projected
        // (Spark truncates ns→µs on read; epoch-seconds are safe)
        min(unix_timestamp(col("ts"))).as("session_start_epoch"),
        max(unix_timestamp(col("ts"))).as("session_end_epoch"))
      .withColumn("duration_sec",
        col("session_end_epoch") - col("session_start_epoch"))
  }

  /** x135: session transition matrix — within-session consecutive event
    * pairs (lag over (user, ts, event_id) with the inactivity-gap cut),
    * each transition reported with its count, the conditional
    * P(next | prev), and the LIFT against the unconditional P(next) —
    * the behavioral read that separates "B follows A because everyone
    * does B" from a real sequential dependency.
    *
    * Determinism & scale: one window shuffle on user_id produces the
    * pairs; the matrix is |types|²-bounded from then on and every ratio
    * is exact integer ppm (lift = cond_ppm·10⁶ div next_ppm — a ratio
    * of two already-exact ppms, so no BIGINT cross-product can overflow
    * at any corpus size). Margins are windows over the tiny matrix, not
    * join-backs. Output: top-`topK` by (count desc, prev, next). */
  def sessionTransitions(events: DataFrame, gapMinutes: Int = 30,
                         topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    val pairs = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("gap_sec",
        unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(byUser))
      .filter(col("prev_type").isNotNull && col("gap_sec") <= gapSec)
      .select(col("prev_type"), col("event_type").as("next_type"))
    val matrix = pairs.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_trans"))
    matrix
      .withColumn("n_from",
        sum(col("n_trans")).over(Window.partitionBy("prev_type")))
      .withColumn("n_to",
        sum(col("n_trans")).over(Window.partitionBy("next_type")))
      .withColumn("total", sum(col("n_trans")).over(Window.partitionBy()))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        expr("(n_trans * 1000000L) div n_from").as("p_cond_ppm"),
        expr("((n_trans * 1000000L) div n_from) * 1000000L div " +
          "((n_to * 1000000L) div total)").as("lift_ppm"))
      .orderBy(col("n_trans").desc, col("prev_type"), col("next_type"))
      .limit(topK)
  }

  /** DuckDB twin of [[sessionTransitions]]. */
  def sessionTransitionsSql(gapMinutes: Int = 30, topK: Int = 20): String = {
    val gapSec = gapMinutes * 60
    s"""WITH st_pairs AS (
       |  SELECT prev_type, event_type AS next_type FROM (
       |    SELECT event_type,
       |      lag(event_type) OVER uw AS prev_type,
       |      date_diff('second', lag(ts) OVER uw, ts) AS gap_sec
       |    FROM events
       |    WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id))
       |  WHERE prev_type IS NOT NULL AND gap_sec <= $gapSec
       |), st_m AS (
       |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
       |  FROM st_pairs GROUP BY prev_type, next_type
       |)
       |SELECT prev_type, next_type, n_trans,
       |  CAST((n_trans * 1000000) //
       |    sum(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS p_cond_ppm,
       |  CAST(((n_trans * 1000000) //
       |      sum(n_trans) OVER (PARTITION BY prev_type)) * 1000000 //
       |    ((sum(n_trans) OVER (PARTITION BY next_type) * 1000000) //
       |      sum(n_trans) OVER ()) AS BIGINT) AS lift_ppm
       |FROM st_m
       |ORDER BY n_trans DESC, prev_type, next_type
       |LIMIT $topK""".stripMargin
  }

  def userSessionsSql(gapMinutes: Int): String = {
    val gapSec = gapMinutes * 60
    s"""WITH marked AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |           OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > $gapSec
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |),
       |numbered AS (
       |  SELECT user_id, ts,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
       |  FROM marked
       |)
       |SELECT user_id, session_no, count(*) AS n_events,
       |  min(CAST(floor(epoch(ts)) AS BIGINT)) AS session_start_epoch,
       |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS session_end_epoch,
       |  max(CAST(floor(epoch(ts)) AS BIGINT)) - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_sec
       |FROM numbered GROUP BY user_id, session_no""".stripMargin
  }
}

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

  /** x167: sessionization gap-threshold yield curve — x16 sessionizes at
    * ONE gap cutoff; this prices EVERY cutoff in one pass. The whole
    * knob's behavior is the inter-event gap histogram: at threshold g,
    * sessions(g) = n_users + #{gaps > g}, so per gap band (e_{k−1}, e_k]
    * over a fixed edge ladder (1 s … 1 day) the report carries gap count
    * and distinct users, and the cumulative count STRICTLY ABOVE band k
    * plus n_users is exactly the session count at cutoff e_k — pick the
    * plateau, ship that gap. Global user/event totals ride every row as
    * the denominators.
    *
    * Determinism: gaps are differences of each user's SORTED epoch-second
    * sequence — a multiset invariant, so equal-timestamp tie order cannot
    * change any gap; band edges are integer compares.
    *
    * Scale shape: one per-user lag window (entity-bounded groups, the
    * audited x16 shape), then (band, user)- and band-keyed aggregates —
    * map-side partials collapse any machine-gun user before the shuffle;
    * output ≤15 rows + a 1-row broadcast of the totals. */
  def sessionYieldCurve(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.EdgeLadder
    val edges = EdgeLadder.secondsLadder
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gaps = events.select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .select(col("user_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev")))
          .as("gap_sec"))
    val perBand = gaps
      .withColumn("band", EdgeLadder.band(col("gap_sec"), edges))
      .groupBy("band", "user_id").agg(count(lit(1)).as("n_g"))
      .groupBy("band")
      .agg(sum(col("n_g")).as("n_gaps"),
        count(lit(1)).as("n_users_with_gap"))
    val tot = events.agg(count(lit(1)).as("n_events_total"),
      count_distinct(col("user_id")).as("n_users_total"))
    perBand.crossJoin(broadcast(tot))
      .select(col("band"), EdgeLadder.hiEdge("band", edges).as("gap_hi_sec"),
        col("n_gaps"), col("n_users_with_gap"),
        col("n_users_total"), col("n_events_total"))
  }

  /** DuckDB twin of [[sessionYieldCurve]]. */
  def sessionYieldCurveSql: String = {
    import graft.functions.EdgeLadder
    val edges = EdgeLadder.secondsLadder
    val bandExpr = EdgeLadder.bandSql("gap_sec", edges)
    val hiCase = EdgeLadder.hiEdgeSql("band", edges)
    s"""WITH sy_g AS (
       |  SELECT user_id,
       |    CAST(floor(epoch(ts)) AS BIGINT)
       |      - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
       |          ORDER BY ts))) AS BIGINT) AS gap_sec
       |  FROM events
       |  QUALIFY lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NOT NULL
       |), sy_b AS (
       |  SELECT user_id, CAST($bandExpr AS BIGINT) AS band FROM sy_g
       |), sy_pb AS (
       |  SELECT band,
       |    CAST(sum(n_g) AS BIGINT) AS n_gaps,
       |    CAST(count(*) AS BIGINT) AS n_users_with_gap
       |  FROM (SELECT band, user_id, count(*) AS n_g
       |        FROM sy_b GROUP BY band, user_id)
       |  GROUP BY band
       |), sy_tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_events_total,
       |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_total
       |  FROM events
       |)
       |SELECT band, CAST($hiCase AS BIGINT) AS gap_hi_sec,
       |  n_gaps, n_users_with_gap, n_users_total, n_events_total
       |FROM sy_pb CROSS JOIN sy_tot""".stripMargin
  }

  /** x136: incremental aggregate refresh — the materialized-view
    * maintenance pattern: the base corpus (event_id % 10 != 0, standing
    * in for "already aggregated yesterday") and the late batch
    * (event_id % 10 == 0) are aggregated SEPARATELY and merged by
    * summing partials — never rescanning the base rows. The oracle twin
    * computes the same aggregate DIRECTLY over all rows, so the gate's
    * hash equality IS the refresh-equals-recompute proof, per value.
    * Works because every kept aggregate is mergeable (counts and
    * DECIMAL-snapped sums; a count-distinct would need the x118 HLL
    * registers instead — that is exactly what they are for).
    *
    * Scale: the base partial is |types|×|hours|-sized state from
    * yesterday; today's cost is the late batch's aggregate plus a
    * state-sized merge. Output: top-`topK` (event_type, hour_epoch,
    * n_events, sum_value_micro) by (n desc, type, hour). */
  def incrementalRefresh(events: DataFrame, topK: Int = 20): DataFrame = {
    def partial(df: DataFrame) = df
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 3600L").as("hour_epoch"),
        floor(col("value").cast("double") * lit(1e6) + lit(0.5)).cast("long")
          .as("v_micro"))
      .groupBy("event_type", "hour_epoch")
      .agg(count(lit(1)).as("n_events"), sum(col("v_micro")).as("sum_v"))
    // coalesce: a NULL event_id makes BOTH modulo predicates evaluate
    // to null, silently dropping the row from both partials while the
    // direct-aggregate oracle still counts it — the refresh==recompute
    // equivalence must hold on ANY input, so nulls route explicitly
    // into the late partial (0 % 10 == 0)
    val split = coalesce(col("event_id"), lit(0L)) % 10
    val base = partial(events.filter(split =!= 0))
    val late = partial(events.filter(split === 0))
    base.unionByName(late)
      .groupBy("event_type", "hour_epoch")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_v")).as("sum_value_micro"))
      .orderBy(col("n_events").desc, col("event_type"), col("hour_epoch"))
      .limit(topK)
  }

  /** DuckDB twin of [[incrementalRefresh]] — the DIRECT aggregate, no
    * split: hash equality against the merged form is the equivalence
    * proof. */
  def incrementalRefreshSql(topK: Int = 20): String =
    s"""SELECT event_type,
       |  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_epoch,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1e6 + 0.5) AS BIGINT))
       |    AS BIGINT) AS sum_value_micro
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY n_events DESC, event_type, hour_epoch
       |LIMIT $topK""".stripMargin

  /** x137: event-time disorder profile — per type, how out-of-order the
    * stream actually is, measured against arrival order (event_id is
    * the ingest sequence): an event is LATE when its event time sits
    * below the running max of everything that arrived before it, and
    * its lateness is that gap. This is the read that SIZES a watermark:
    * `withWatermark(ts, X)` silently drops every event later than X, so
    * X comes from max_late_sec (or a chosen quantile of it), not from a
    * guess.
    *
    * The running max is inherently a prefix scan, but `event_type` has
    * a dozen values — a window partitioned on it alone would sort each
    * type's ENTIRE history in one task. [[graft.operators.TwoPhase]]
    * decomposes it instead: `event_id` (the ingest sequence, a known
    * range from a 1-row aggregate) equi-width-buckets into 64
    * deterministic ranges, each (type, bucket) reports its max once,
    * the bucket maxes become broadcast prefix offsets, and
    * prior_max(row) = greatest(prefix offset, within-bucket prior) —
    * per-task input is one bucket, never one type. Exact integers out.
    *
    * Output: (event_type, n_events, n_late, late_ppm, max_late_sec). */
  def disorderProfile(events: DataFrame, buckets: Int = 64): DataFrame =
    lateness(events, buckets)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("late_sec")).as("n_late"),
        coalesce(max(col("late_sec")), lit(0L)).as("max_late_sec"))
      .select(col("event_type"), col("n_events"), col("n_late"),
        expr("(n_late * 1000000L) div n_events").as("late_ppm"),
        col("max_late_sec"))

  /** The shared lateness kernel behind x137 and x168: per event, how far
    * behind the running per-type event-time high-water mark it arrived
    * (arrival order = event_id), NULL when in order — the TwoPhase
    * carry-forward max over 64 equi-width arrival buckets, never a
    * global window. */
  private def lateness(events: DataFrame, buckets: Int): DataFrame = {
    val ev = events.select(col("event_type"), col("event_id"),
      unix_timestamp(col("ts")).as("epoch"))
    val ids = ev.agg(min(col("event_id")).as("e0"), max(col("event_id")).as("e1"))
    graft.operators.TwoPhase.prefixed(
      ev.crossJoin(broadcast(ids)),
      partCols = Seq("event_type"),
      bucketCol = graft.operators.TwoPhase.equiWidthBucketSql(
        "event_id", "e0", "e1", buckets),
      orderCols = Seq(col("event_id")),
      maxes = Seq("pm" -> col("epoch")))
      .withColumnRenamed("pm_prior", "prior_max")
      .select(col("event_type"),
        when(col("prior_max").isNotNull && col("epoch") < col("prior_max"),
          col("prior_max") - col("epoch")).as("late_sec"))
  }

  /** x168: watermark-delay yield curve — x137 says HOW MUCH disorder each
    * type carries (late count, worst case); this prices the knob that
    * disorder forces: for every candidate watermark delay d, how many
    * events arrive MORE than d behind the high-water mark and would be
    * dropped by a `withWatermark(d)` stream. Every event bands on the
    * x167 edge ladder by its lateness (in-order events have lateness 0
    * and sit in band 0, so the curve is the COMPLETE lateness
    * distribution and stays non-vacuous on a perfectly ordered feed —
    * this corpus — where it states "drop bill 0 at every delay"); the
    * cumulative count STRICTLY above band k is exactly the drop bill at
    * delay e_k, and the per-type totals ride every row so drop ppm is a
    * division away. The knee (where the curve flattens) is the delay to
    * ship; max_late_sec (x137) is where it reaches zero.
    *
    * Scale shape: the same TwoPhase lateness kernel as x137 (bucketed
    * carry-forward max, no global window), then a (type, band)-keyed
    * count — ≤|types|·15 output rows — and a broadcast join of the
    * |types|-row totals. */
  def watermarkYieldCurve(events: DataFrame, buckets: Int = 64): DataFrame = {
    import graft.functions.EdgeLadder
    val edges = EdgeLadder.secondsLadder
    val late = lateness(events, buckets)
      .select(col("event_type"),
        coalesce(col("late_sec"), lit(0L)).as("late_sec"),
        col("late_sec").isNotNull.as("was_late"))
    val tot = late.groupBy("event_type")
      .agg(count(lit(1)).as("n_events_total"),
        sum(when(col("was_late"), 1L).otherwise(0L)).as("n_late_total"))
    late
      .withColumn("band", EdgeLadder.band(col("late_sec"), edges))
      .groupBy("event_type", "band")
      .agg(count(lit(1)).as("n_in_band"))
      .join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("band"),
        EdgeLadder.hiEdge("band", edges).as("late_hi_sec"),
        col("n_in_band"), col("n_late_total"), col("n_events_total"))
  }

  /** DuckDB twin of [[watermarkYieldCurve]] — the oracle computes the
    * same lateness with a plain per-type window (oracle scale), bands
    * identically. */
  def watermarkYieldCurveSql: String = {
    import graft.functions.EdgeLadder
    val edges = EdgeLadder.secondsLadder
    val bandExpr = EdgeLadder.bandSql("late_sec", edges)
    val hiCase = EdgeLadder.hiEdgeSql("band", edges)
    s"""WITH wy_l0 AS (
       |  SELECT event_type,
       |    CASE WHEN prior_max IS NOT NULL AND epoch < prior_max
       |      THEN prior_max - epoch END AS late0
       |  FROM (
       |    SELECT event_type,
       |      CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
       |      max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
       |        PARTITION BY event_type ORDER BY event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
       |    FROM events)
       |), wy_l AS (
       |  SELECT event_type, coalesce(late0, 0) AS late_sec,
       |    late0 IS NOT NULL AS was_late
       |  FROM wy_l0
       |), wy_tot AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events_total,
       |    CAST(sum(CASE WHEN was_late THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_late_total
       |  FROM wy_l GROUP BY event_type
       |), wy_b AS (
       |  SELECT event_type, CAST($bandExpr AS BIGINT) AS band
       |  FROM wy_l
       |)
       |SELECT b.event_type, b.band, CAST($hiCase AS BIGINT) AS late_hi_sec,
       |  CAST(count(*) AS BIGINT) AS n_in_band, t.n_late_total,
       |  t.n_events_total
       |FROM wy_b b JOIN wy_tot t USING (event_type)
       |GROUP BY b.event_type, b.band, t.n_late_total, t.n_events_total"""
      .stripMargin
  }

  /** DuckDB twin of [[disorderProfile]]. */
  def disorderProfileSql: String =
    s"""WITH dp AS (
       |  SELECT event_type,
       |    CASE WHEN prior_max IS NOT NULL AND epoch < prior_max
       |      THEN prior_max - epoch END AS late_sec
       |  FROM (
       |    SELECT event_type,
       |      CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
       |      max(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
       |        PARTITION BY event_type ORDER BY event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
       |    FROM events)
       |)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(count(late_sec) AS BIGINT) AS n_late,
       |  CAST((count(late_sec) * 1000000) // count(*) AS BIGINT) AS late_ppm,
       |  CAST(COALESCE(max(late_sec), 0) AS BIGINT) AS max_late_sec
       |FROM dp GROUP BY event_type""".stripMargin

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

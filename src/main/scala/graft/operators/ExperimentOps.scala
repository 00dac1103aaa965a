package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Experiment analytics over the event stream — the A/B readout a
  * pipeline team runs on its own telemetry. The arm assignment is the
  * deterministic hash split production bucketing uses (no stored
  * assignment table, stable under replays and backfills), and the
  * significance read is the G² likelihood-ratio test on the 2×2
  * (arm × converted) table — the same statistic as x81's keyness, whose
  * cross-engine determinism contract this reuses: counts are exact
  * BIGINTs, each cell ratio O·N/(R·C) is computed on DOUBLES in one
  * fixed operation order (BIGINT cross-products would ANSI-overflow at
  * real user counts), ln is trusted on that ratio class, and the
  * statistic snaps to micro-nats once at the end. G² > 3.84 ≈ p < 0.05
  * on 1 df — the number a dashboard thresholds on.
  *
  * Scale shape: one shuffle onto user_id (the per-user collapse — the
  * relation is |users|-sized from then on), then a single-row aggregate.
  * Nothing else touches the fact table.
  */
object ExperimentOps {

  /** 2-arm readout: users hash-split 50/50, converted = emitted
    * `convEvent` at least once. Output: 1 row (n_a, conv_a, cr_a_ppm,
    * n_b, conv_b, cr_b_ppm, delta_ppm, g2_micro). */
  def abReadout(events: DataFrame,
                convEvent: String = "purchase"): DataFrame = {
    val perUser = events
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convEvent, 1L).otherwise(0L))
        .as("conv"))
      .select(
        pmod(HashFunctions.hash60(col("user_id").cast("string")), lit(2L))
          .as("arm"), col("conv"))
    val counts = perUser.agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("conv_b"))
    // the four G² terms written out in fixed order; a zero cell
    // contributes zero (lim x·ln x = 0), guarded explicitly
    def term(o: String, r: String, c: String): String =
      s"CASE WHEN $o > 0 THEN CAST($o AS DOUBLE) * ln((CAST($o AS DOUBLE) " +
        s"* CAST(n AS DOUBLE)) / (CAST($r AS DOUBLE) * CAST($c AS DOUBLE))) " +
        s"ELSE CAST(0 AS DOUBLE) END"
    counts
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("miss_a", col("n_a") - col("conv_a"))
      .withColumn("miss_b", col("n_b") - col("conv_b"))
      .withColumn("conv_t", col("conv_a") + col("conv_b"))
      .withColumn("miss_t", col("miss_a") + col("miss_b"))
      .select(col("n_a"), col("conv_a"),
        expr("(conv_a * 1000000L) div n_a").as("cr_a_ppm"),
        col("n_b"), col("conv_b"),
        expr("(conv_b * 1000000L) div n_b").as("cr_b_ppm"),
        expr("(conv_b * 1000000L) div n_b - (conv_a * 1000000L) div n_a")
          .as("delta_ppm"),
        expr("CAST(floor(2.0 * (" +
          term("conv_a", "n_a", "conv_t") + " + " +
          term("miss_a", "n_a", "miss_t") + " + " +
          term("conv_b", "n_b", "conv_t") + " + " +
          term("miss_b", "n_b", "miss_t") +
          ") * 1e6 + 0.5) AS BIGINT)").as("g2_micro"))
  }

  /** DuckDB twin of [[abReadout]]. */
  def abReadoutSql(convEvent: String = "purchase"): String = {
    val h = HashFunctions.hash60Sql("CAST(user_id AS VARCHAR)")
    def term(o: String, r: String, c: String): String =
      s"CASE WHEN $o > 0 THEN CAST($o AS DOUBLE) * ln((CAST($o AS DOUBLE) " +
        s"* CAST(n AS DOUBLE)) / (CAST($r AS DOUBLE) * CAST($c AS DOUBLE))) " +
        s"ELSE CAST(0 AS DOUBLE) END"
    s"""WITH ab_user AS (
       |  SELECT CAST($h % 2 AS BIGINT) AS arm,
       |    max(CASE WHEN event_type = '$convEvent' THEN 1 ELSE 0 END) AS conv
       |  FROM events WHERE user_id IS NOT NULL
       |  GROUP BY user_id
       |), ab_counts AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM ab_user
       |), ab_m AS (
       |  SELECT *, n_a + n_b AS n, n_a - conv_a AS miss_a,
       |    n_b - conv_b AS miss_b, conv_a + conv_b AS conv_t,
       |    (n_a - conv_a) + (n_b - conv_b) AS miss_t
       |  FROM ab_counts
       |)
       |SELECT n_a, conv_a,
       |  CAST((conv_a * 1000000) // n_a AS BIGINT) AS cr_a_ppm,
       |  n_b, conv_b,
       |  CAST((conv_b * 1000000) // n_b AS BIGINT) AS cr_b_ppm,
       |  CAST((conv_b * 1000000) // n_b - (conv_a * 1000000) // n_a
       |    AS BIGINT) AS delta_ppm,
       |  CAST(floor(2.0 * (
       |    ${term("conv_a", "n_a", "conv_t")} +
       |    ${term("miss_a", "n_a", "miss_t")} +
       |    ${term("conv_b", "n_b", "conv_t")} +
       |    ${term("miss_b", "n_b", "miss_t")}
       |  ) * 1e6 + 0.5) AS BIGINT) AS g2_micro
       |FROM ab_m""".stripMargin
  }
}

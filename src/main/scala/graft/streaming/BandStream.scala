package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming band join — the streaming twin of
  * `graft.operators.TemporalJoins.bandJoin`, constrained to event-time
  * proximity so stream-stream state is watermark-evictable: pairs
  * `(l, r)` in the same key group with
  * `l.val < r.val <= l.val + width` AND `|r.ts − l.ts| <= maxLag`.
  *
  * An unbounded value-band join cannot stream (either side would have to
  * buffer forever — any future row might still band-match an arbitrarily
  * old one); the time bound is what makes the operator well-defined over
  * infinite inputs, and it is the form a pipeline actually wants
  * ("similar-valued events near each other in time").
  *
  * Implemented as a NATIVE stream-stream equi-join — no custom state:
  * the value axis is bucketed exactly like the batch operator (each
  * right row lands in one bucket, each left band probes its covered
  * buckets, ulp-safe upper probe, every true pair meets exactly once),
  * and the bucket equality plus the two event-time range predicates form
  * the join condition, so Spark's symmetric hash join derives state
  * watermarks and evicts both sides' buffers as event time advances.
  * Callers apply `withWatermark` to BOTH inputs before joining (the spec
  * shows the shape). The same function runs in batch — Catalyst plans
  * the identical equi-join without state — which is the parity gate.
  *
  * Contract: key columns share names across the two inputs; all other
  * column names are disjoint (as in the batch operator).
  */
object BandStream {

  def valueBandWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftVal: String, rightVal: String, width: Double,
                      leftTs: String, rightTs: String,
                      maxLagSeconds: Long): DataFrame = {
    val lb = floor(col(leftVal) / width).cast("long")
    val ub = floor((col(leftVal) + width) / width).cast("long")
    val l2 = left.withColumn("__lbucket", explode(sequence(lb, greatest(lb, ub))))
    val r2 = right
      .withColumn("__rbucket", floor(col(rightVal) / width).cast("long"))
      .withColumnsRenamed(keys.map(k => k -> s"__rk_$k").toMap)
    val lag = expr(s"INTERVAL $maxLagSeconds SECONDS")
    val cond: Column = (
      keys.map(k => col(k) === col(s"__rk_$k")) ++ Seq(
        col("__lbucket") === col("__rbucket"),
        col(rightVal) > col(leftVal),
        col(rightVal) <= col(leftVal) + width,
        // both range directions stated on both columns: this is what lets
        // the streaming planner bound each side's state watermark
        col(rightTs) >= col(leftTs) - lag,
        col(rightTs) <= col(leftTs) + lag)
      ).reduce(_ && _)
    l2.join(r2, cond)
      .drop("__lbucket", "__rbucket")
      .drop(keys.map(k => s"__rk_$k"): _*)
  }
}

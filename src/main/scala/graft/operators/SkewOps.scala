package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §4: "AQE skew handling for hash-join
  * on sha1_hash — duplicate files ARE skew").
  *
  * AQE's skew-join split covers sort-merge joins at runtime; explicit
  * salting is for the cases AQE can't fix — aggregations over a hot key
  * and shuffled joins where one key dominates a partition beyond the
  * split threshold. Salting here is deterministic (hash of the whole
  * row's stable key, not rand()) so results are reproducible and
  * re-runnable batches stay idempotent.
  */
object SkewOps {

  /** Two-stage (salted) aggregation for COMMUTATIVE aggregates over a
    * skewed key: stage 1 aggregates (key, salt) — spreading a hot key
    * over `buckets` reducers — stage 2 folds the partials. `saltBy` must
    * be a stable per-row column (e.g. the row's unique id). */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltBy: String,
                  buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(saltBy)), lit(buckets.toLong)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as("n"))
  }

  /** Salted equi-join for a skewed big side against a small-ish build
    * side: the big side's hot keys spread across `buckets` partitions;
    * the build side is replicated ×buckets (explode) so every salted key
    * still finds its match. Result equals the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBy: String, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(buckets.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt").drop("__salt")
  }
}

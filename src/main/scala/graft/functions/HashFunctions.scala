package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing helpers.
  *
  * The dedup/LSH operators need hash functions that produce the SAME value
  * in Spark and in the DuckDB correctness oracle. Spark's `xxhash64`/`hash`
  * and DuckDB's `hash` are different algorithms, so everything portable
  * here is built on MD5 (identical hex output in both engines).
  *
  * At 100 TB scale MD5-based hashing is ~3x slower than xxhash64; the
  * operators accept a pluggable hash so production runs can switch to
  * `xxhash64` while correctness runs stay oracle-portable.
  */
object HashFunctions {

  /** 60-bit non-negative hash from the first 15 hex chars of md5.
    * Portable: DuckDB twin is
    * `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member i (for minhash). */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(lit(s"$seed|"), c.cast("string")))

  /** Fast non-portable 64-bit hash for production paths (not oracle-checked). */
  def fastHash(cols: Column*): Column = xxhash64(cols: _*)

  /** DuckDB SQL snippet twin of [[hash60]] — keep in sync. */
  def hash60Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5(CAST($expr AS VARCHAR)), 1, 15)) AS BIGINT)"

  def hash60Sql(expr: String, seed: Int): String =
    hash60Sql(s"concat('$seed|', CAST($expr AS VARCHAR))")
}

package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cache of eagerly pinned (localCheckpoint'd) views.
  *
  * Several one-scan query shapes (duplicate search's union branches,
  * concurrent-session interval joins) pin a derived view so the plan
  * scans it once instead of rebuilding it per branch. The pin is eager
  * by necessity — a lazy checkpoint only persists after the first job,
  * so within the single union job every branch would still rebuild the
  * view. Pinning at DataFrame-construction time, however, means every
  * INVOCATION used to materialize a fresh checkpoint (N bench rounds =
  * N pinned copies, reclaimed only on GC) and even plan-only callers
  * (explain tooling, plan-shape specs) paid the job.
  *
  * This cache keys the pin by (session, canonicalized logical plan), so
  * N invocations over the same view pin it ONCE — the same
  * train-once/probe-many shape as SparkEntry's ivfCache. Distinct plans
  * (a crawl round's updated state, a different sfDir) key separately:
  * mutated pipelines re-derive their views from fresh checkpointed
  * leaves, so their plans never collide with a stale entry.
  *
  * At 100 TB the pin itself would be a reliable checkpoint / temp table
  * instead of executor-memory localCheckpoint (same caveat as
  * DedupOps.IterState); the cache contract is unchanged.
  */
object PinnedViews {
  // semanticHash is a 32-bit digest — a collision between two DISTINCT
  // plans must not serve the wrong pin, so each hash bucket holds
  // (analyzed plan, pin) pairs and a hit requires sameResult(), exactly
  // how Spark's own plan caches pair the hash with plan equality.
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, Int),
      List[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]]

  /** The pinned twin of `df`: localCheckpoint'd once per (session,
    * semantic plan); later calls with a semantically equal plan reuse
    * the existing checkpoint. */
  def pinned(df: DataFrame): DataFrame = synchronized {
    val plan = df.queryExecution.analyzed
    val key = (df.sparkSession, plan.semanticHash())
    val bucket = cache.getOrElse(key, Nil)
    bucket.find(_._1.sameResult(plan)) match {
      case Some((_, pin)) => pin
      case None =>
        val pin = df.localCheckpoint(true)
        cache.update(key, (plan, pin) :: bucket)
        pin
    }
  }

  /** Drop every pin held for `session` (called by the state-store write
    * paths on mutation; also test isolation / catalog refresh). */
  def invalidate(session: SparkSession): Unit =
    cache.keys.filter(_._1 eq session).foreach(cache.remove)
}

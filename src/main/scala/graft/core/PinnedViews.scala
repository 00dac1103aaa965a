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
  // Plain HashMaps: every access runs under this object's monitor (the
  // generation protocol requires it), so a concurrent map would only
  // suggest lock-free paths that don't exist.
  private val cache = scala.collection.mutable.HashMap
    .empty[(SparkSession, Int),
      List[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]]
  // per-session invalidation generation: a pin built from a plan captured
  // BEFORE an invalidation must not be cached AFTER it (it may hold
  // pre-mutation rows); bumping the generation under the same monitor as
  // the cache insert closes that window
  private val generations =
    scala.collection.mutable.HashMap.empty[SparkSession, Long]

  private def lookup(key: (SparkSession, Int),
                     plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    cache.getOrElse(key, Nil).find(_._1.sameResult(plan)).map(_._2)

  // entries for stopped sessions are unreachable (a stopped session's
  // DataFrames can't run) — sweep them so a long-lived JVM creating
  // sessions repeatedly doesn't pin plans and sessions forever. Called
  // under the monitor from both public entry points.
  private def sweepStopped(): Unit = {
    val dead = cache.keys.filter(_._1.sparkContext.isStopped).toList
    dead.foreach(cache.remove)
    generations.keys.filter(_.sparkContext.isStopped).toList
      .foreach(generations.remove)
  }

  /** The pinned twin of `df`: localCheckpoint'd once per (session,
    * semantic plan); later calls with a semantically equal plan reuse
    * the existing checkpoint. The checkpoint job itself runs OUTSIDE the
    * monitor — concurrent callers pinning different views don't
    * serialize on each other's Spark jobs (a lost race costs one
    * redundant, GC-reclaimed checkpoint, never a wrong answer). */
  def pinned(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val key = (df.sparkSession, plan.semanticHash())
    val (hit, genBefore) = synchronized {
      sweepStopped()
      (lookup(key, plan), generations.getOrElse(df.sparkSession, 0L))
    }
    hit match {
      case Some(pin) => pin
      case None =>
        val pin = df.localCheckpoint(true) // blocking Spark job — no lock held
        synchronized {
          if (generations.getOrElse(df.sparkSession, 0L) != genBefore)
            pin // invalidated mid-build: usable by THIS caller, never cached
          else lookup(key, plan) match {
            case Some(winner) => winner // concurrent builder won the insert
            case None =>
              cache.update(key, (plan, pin) :: cache.getOrElse(key, Nil))
              pin
          }
        }
    }
  }

  /** Current invalidation generation for `session` — lets derived caches
    * (e.g. DedupOps' Bloom-sketch memo, whose entries hang off a pin's
    * plan) evict entries built against superseded pins instead of holding
    * them for the session's lifetime. */
  def generation(session: SparkSession): Long = synchronized {
    generations.getOrElse(session, 0L)
  }

  /** Drop every pin held for `session` (called by the state-store write
    * paths on mutation; also test isolation / catalog refresh). */
  def invalidate(session: SparkSession): Unit = synchronized {
    sweepStopped()
    generations.update(session, generations.getOrElse(session, 0L) + 1L)
    cache.keys.filter(_._1 eq session).toList.foreach(cache.remove)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{NearDupIndex, ShardAdmission, SpanIndex}

/** The full production ingest loop, streaming: per micro-batch, emit
  * the [[ShardAdmission]] manifest for the arriving shard (the
  * per-content decision record an operator audits and a downstream
  * trimmer consumes) and commit the batch to BOTH persisted indexes —
  * the near-dup signature index (admitted contents + the rejected-copy
  * ledger) and the exact-substring index (novel window hashes) — so
  * the next batch admits against everything this one brought.
  *
  * Exactly-once, per part:
  *   - index extensions: epoch NAMING (`b<id>` per index; a replayed
  *     batch id is a committed-manifest no-op, a crashed half-written
  *     attempt rebuilds deterministically — the [[NearDupStream]] /
  *     [[SpanStream]] contract);
  *   - the manifest sink: one overwritten directory per batch id
  *     (`out/batch=<id>`), so a replay rewrites the same rows in place
  *     rather than appending duplicates.
  *
  * ORDER MATTERS and is pinned here: manifest write → near-dup extend
  * → span extend. Decisions must reflect the PRE-batch index state
  * (the batch [[ShardAdmission.report]] semantics), so a replay that
  * arrives AFTER an index already committed `b<id>` must not recompute
  * the manifest — the index it would read now contains the batch
  * itself, and every decision would collapse to reject_exact. The
  * guard is the near-dup manifest: `b<id>` committed there proves the
  * manifest write COMPLETED on the prior attempt (it strictly
  * precedes the extend), so the replay skips straight to the
  * (idempotent) extends; `b<id>` absent means the crash hit at or
  * before the manifest write, and rewriting against the unadvanced
  * index is bit-identical.
  *
  * `maintainEvery` applies both indexes' tail compaction (base never
  * rewritten) whenever either accretion tail reaches the bound. */
object AdmissionStream {

  /** `stream` must carry (doc_id, text). Returns the running query;
    * the manifest lands under `outDir/batch=<id>/`. */
  def ingest(stream: DataFrame, nearDupRoot: String, spanRoot: String,
             outDir: String, checkpointDir: String,
             minMatches: Int = NearDupIndex.defaultMinMatches,
             w: Int = SpanIndex.defaultW,
             maintainEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // hasEpoch, not raw manifest membership: a tail compaction may
        // have folded b<id> into a merged epoch (covered.json) — the
        // replay must still skip the manifest recompute
        if (!NearDupIndex.hasEpoch(nearDupRoot, s"b$id"))
          ShardAdmission.report(batch, nearDupRoot, spanRoot, minMatches,
              w, pin = false) // per-batch pins would outlive the batch
            .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        NearDupIndex.extendEpoch(batch, nearDupRoot, s"b$id", minMatches)
        SpanIndex.extendEpoch(batch, spanRoot, s"b$id", w)
        if (maintainEvery > 0) {
          if (NearDupIndex.tailSize(nearDupRoot) >= maintainEvery)
            NearDupIndex.compactTail(batch.sparkSession, nearDupRoot)
          if (SpanIndex.tailSize(spanRoot) >= maintainEvery)
            SpanIndex.compactTail(batch.sparkSession, spanRoot)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IntegrityOps

/** Referential integrity on ingest — the online twin of
  * [[graft.operators.IntegrityOps.fkAudit]] (x147). Two halves, both
  * against the OFFLINE parent key sets (the [[DecontaminationStream]]
  * pattern: a static relation joined stream-static each micro-batch,
  * zero join state):
  *
  *  - [[flagOnIngest]]: each arriving child row is flagged dangling the
  *    moment it arrives (broadcast left anti-join SEMANTICS as a flag
  *    column — the row itself passes through, because a pipeline wants
  *    to quarantine orphans, not silently drop them the way a
  *    downstream inner join would). Stateless, append mode.
  *  - [[auditPanelOnIngest]]: the live edge audit. The audit row needs
  *    the parent join + a global aggregate Structured Streaming cannot
  *    run as one query; its SUFFICIENT STATISTIC can: the
  *    key-compressed child panel `(k, c)` — one stateful aggregation,
  *    |distinct child keys| rows of state, the only measure a sum.
  *    Reads finish the live panel with the SAME
  *    [[graft.operators.IntegrityOps.auditFromPanel]] the batch path
  *    uses, so stream-then-finish == batch x147 on every arrival
  *    prefix (IntegrityStreamSpec pins it). Snapshot-then-finish is
  *    the read discipline (the finishing read is multi-job and a
  *    complete-mode sink may rewrite between jobs).
  *
  * Replay semantics: the panel's count is a sum — deliver exactly-once
  * or dedup upstream (the CMS rule). The per-row flag is idempotent.
  *
  * Scale: the parent key set is key-compressed offline (|distinct pk|,
  * dims are broadcast-sized; the one fact-sized parent — orders — is
  * bounded by |orderkeys|, still far under the child stream's row
  * volume); panel state is |distinct fk| regardless of arrival rate.
  * Reference: the batch audit mirrors file_db's pre-flight integrity
  * reads (FileDbDAL/Search.py existence probes before joins).
  */
object IntegrityStream {

  /** Offline half: the parent's distinct key projection, computed once
    * from the warehouse table. Distinct is correct here (the flag only
    * asks existence) and bounds the broadcast by |distinct pk|. */
  def parentKeys(parent: DataFrame, pk: String): DataFrame =
    parent.select(col(pk).as("k")).distinct()
      .select(col("k"), lit(1).as("__hit"))

  /** Per-row dangling-child flag at ingest: `child.*` + `orphan` (1 =
    * no parent row exists — including NULL fk, which vanishes from
    * inner joins exactly like a dangling key; the batch audit counts
    * it identically). Stateless stream-static broadcast join, append
    * mode. */
  def flagOnIngest(child: DataFrame, fk: String,
                   parentK: DataFrame): DataFrame = {
    val cols = child.columns.toSeq
    child.join(broadcast(parentK), child(fk) === parentK("k"), "left_outer")
      .select(cols.map(col) :+
        when(col("__hit").isNull, 1).otherwise(0).as("orphan"): _*)
  }

  /** Live audit panel — x147's sufficient statistic, maintained as
    * streaming state. Finish with
    * [[graft.operators.IntegrityOps.auditFromPanel]]. */
  def auditPanelOnIngest(child: DataFrame, fk: String): DataFrame =
    IntegrityOps.childPanel(child, fk)
}

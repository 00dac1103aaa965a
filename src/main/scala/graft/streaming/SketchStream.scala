package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.SketchOps

/** Live HyperLogLog register maintenance — the online half of the x118
  * contract: as events arrive, the per-(group, bucket) registers update
  * in ONE stateful max-aggregation. State is |groups|·m single-byte
  * registers — bounded by construction, no watermark needed, and `max`
  * is idempotent, so replayed micro-batches cannot move a register
  * (exactly-once for free under at-least-once delivery).
  *
  * This IS the production deployment shape: the register table stays
  * live (run with `outputMode("update")` into the serving store, or
  * `complete` into memory), and the distinct estimate is computed ON
  * READ by [[SketchOps.estimateFromRegisters]] — the same finishing
  * expression tree as the batch gate, so online and offline estimates
  * cannot drift. The register relation streamed here is byte-identical
  * to the batch [[SketchOps.registers]] on the same prefix
  * (SketchStreamSpec pins it), which is the HLL merge law in streaming
  * clothes.
  */
object SketchStream {

  /** Streaming register table: (g, bucket, reg). Also correct on a
    * batch frame — that is how the spec pins stream == batch. */
  def registersOnIngest(events: DataFrame, group: Column, item: Column,
                        p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p outside [4,16]")
    SketchOps.registers(events, group, item, 1 << p)
  }

  /** Estimate-on-read over a (live or batch) register table. */
  def estimate(registers: DataFrame, p: Int = 8): DataFrame =
    SketchOps.estimateFromRegisters(registers, 1 << p)
}

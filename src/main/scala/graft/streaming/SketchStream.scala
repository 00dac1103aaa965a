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

  /** Live Count-Min counter table — the online half of the x121/x122
    * contracts: one sum-shaped stateful aggregation over the exploded
    * (row, bucket) cells, state = d·w longs at any stream volume.
    * Counters are SUMS, so the live table over any prefix is
    * byte-identical to the batch [[SketchOps.cmsCounters]] over the
    * same rows (the merge law in streaming clothes — SketchStreamSpec
    * pins it), heavy-hitter probes and join-size inner products read
    * the live table with the batch finishing expressions unchanged.
    * Unlike HLL's idempotent max, sums COUNT replays — deliver
    * exactly-once (checkpointed source offsets) or dedup upstream. */
  /** Live numeric-moments profile — the x150 streaming twin: every
    * statistic in the profile is MERGEABLE (count/sum/sum-of-squares
    * are sums, min/max idempotent), so the whole profile maintains as
    * ONE stateful aggregation with |types| rows of state and the live
    * table equals the batch [[graft.operators.QuantileOps.valueMoments]]
    * on every arrival prefix (SketchStreamSpec pins it) — the
    * mean/variance finishing runs inside the same projection on read.
    * Replay semantics are mixed by statistic and the WEAKEST governs:
    * min/max shrug off replays, the sums count them — deliver
    * exactly-once or dedup upstream (the CMS rule, not the HLL one). */
  def momentsOnIngest(events: DataFrame): DataFrame =
    graft.operators.QuantileOps.valueMoments(events)

  /** Live per-user profile PANEL — x157's streaming twin. The profile
    * itself (dominant-type vote + population-relative flag) is a
    * multi-aggregation Structured Streaming cannot run as one query;
    * its sufficient statistic CAN stream: the (user_id, event_type)
    * panel of count + min/max epoch — one stateful aggregation,
    * |users|·|types| rows of state, every measure a sum or an
    * idempotent extremum. Reads finish the live table with the SAME
    * [[graft.operators.AnomalyOps.profilesFromPanel]] the batch path
    * uses, so stream-then-finish == batch x157 on every arrival prefix
    * (SketchStreamSpec pins it). Replay semantics governed by the
    * weakest measure (the count sums) — exactly-once or dedup
    * upstream, the CMS rule. */
  def profilePanelOnIngest(events: DataFrame): DataFrame =
    graft.operators.AnomalyOps.profilePanel(events)

  /** x163's live half: the (source, dim) anisotropy panel maintained as
    * ONE streaming aggregation over the embedding stream joined
    * (stream-static) to the offline doc→source map. Every measure is a
    * sum, so the state is |sources|×d rows however long the stream; the
    * finishing read is [[graft.operators.SimilarityOps
    * .anisotropyFromPanel]], shared verbatim with batch x163, so
    * stream-then-finish == batch on every arrival prefix
    * (SketchStreamSpec pins it). Replay governed by the sums —
    * exactly-once or dedup upstream, the CMS rule. */
  def anisotropyPanelOnIngest(emb: DataFrame, docs: DataFrame): DataFrame =
    graft.operators.SimilarityOps.anisotropyPanel(docs, emb)

  def cmsOnIngest(df: DataFrame, key: Column, d: Int = 4,
                  w: Int = 512): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 16 && w <= 65536, s"d=$d w=$w")
    import org.apache.spark.sql.functions._
    import graft.functions.HashFunctions
    df.select(key.cast("string").as("k"))
      .select(col("k"), explode(expr(s"sequence(0, ${d - 1})")).as("row_i"))
      .select(col("row_i"),
        pmod(HashFunctions.hash60(
          concat(col("row_i").cast("string"), lit("|"), col("k"))),
          lit(w.toLong)).cast("int").as("bucket"))
      .groupBy("row_i", "bucket").agg(count(lit(1)).as("counter"))
  }
}

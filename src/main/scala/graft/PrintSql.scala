package graft

/** Prints a named generated SQL twin to stdout between markers, for
  * tools/ scripts that run it in DuckDB (tools/scale_smoke.py measures
  * the LSH candidate mass with it) — the generated SQL's single source
  * of truth stays in Scala. */
object PrintSql {
  def main(args: Array[String]): Unit = {
    val sql = args(0) match {
      case "lsh_band_mass" => graft.operators.DedupOps.lshBandMassSql
      case "simhash_block_mass" => graft.operators.DedupOps.simhashBlockMassSql
      case "simhash_rep_block_mass" =>
        graft.operators.DedupOps.simhashRepBlockMassSql
      case "lsh_rep_band_mass" => graft.operators.DedupOps.lshRepBandMassSql
      case "simhash_guarded_block_mass" =>
        graft.operators.DedupOps.simhashGuardedBlockMassSql()
      case "lsh_guarded_band_mass" =>
        graft.operators.DedupOps.lshGuardedBandMassSql()
      case "window_mass" => graft.operators.SubstringOps.windowMassSql(8)
      case "containment_candidate_mass" =>
        graft.operators.DedupOps.guardedCandidateMassSql(16)
      case "retrieval_probe_mass" => graft.operators.RetrievalOps.probeMassSql()
      case "index_skew" => graft.operators.NearDupIndex.indexSkewSql
      case other => sys.error(s"unknown sql name: $other")
    }
    println("-----BEGIN SQL-----")
    println(sql)
    println("-----END SQL-----")
  }
}

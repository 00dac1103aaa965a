package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared banding + readout kernel of the knob-pricing yield curves
  * (x158/x160/x165 ratio bands, x167/x168 threshold ladders, x169/x171/
  * x172 stacked parameter ladders): band a per-item statistic on a
  * fixed integer edge ladder as (e_{k−1}, e_k] so the cumulative mass
  * STRICTLY ABOVE band k is exactly the bill at cutoff e_k — one scan
  * prices every cutoff. Each primitive has a SQL twin renderer so both
  * engines band identically by construction; keeping the pair in one
  * place is what makes the six curves' twins structurally un-driftable.
  *
  * Audit note (PlanLintSpec): banding is a per-row projection + a
  * ≤|edges|-row (or |groups|×|edges|) aggregate — map-side combinable,
  * no window, so a viral band collapses in the partials. */
object EdgeLadder {

  /** The shared seconds ladder (1 s … 1 day) of the x167 gap and x168
    * lateness curves. */
  val secondsLadder: Seq[Long] = Seq(0L, 1L, 2L, 5L, 10L, 30L, 60L, 120L,
    300L, 600L, 1800L, 3600L, 7200L, 86400L)

  /** band k = #edges strictly below x, i.e. x ∈ (e_{k−1}, e_k]; 0 for
    * x ≤ e_0, |edges| for x above the last edge. */
  def band(x: Column, edges: Seq[Long]): Column =
    edges.map(e => when(x > e, 1L).otherwise(0L)).reduce(_ + _)

  /** SQL twin of [[band]] over a column/expression string. */
  def bandSql(x: String, edges: Seq[Long]): String =
    edges.map(e => s"(CASE WHEN $x > $e THEN 1 ELSE 0 END)").mkString(" + ")

  /** Inclusive upper edge of a band (NULL above the last edge) — the
    * human-readable cutoff each band row prices. */
  def hiEdge(bandCol: String, edges: Seq[Long]): Column =
    expr("CASE " + bandCol + " " + edges.zipWithIndex
      .map { case (e, i) => s"WHEN $i THEN ${e}L" }.mkString(" ") +
      " ELSE NULL END")

  /** SQL twin of [[hiEdge]] (engine-default integer literals). */
  def hiEdgeSql(bandCol: String, edges: Seq[Long]): String =
    "CASE " + bandCol + " " + edges.zipWithIndex
      .map { case (e, i) => s"WHEN $i THEN $e" }.mkString(" ") +
      " ELSE NULL END"

  /** Ratio banding: `num/den ∈ [k/bands, (k+1)/bands)` computed
    * integer-exactly as `(num·bands) div den`, clamped so share 1.0
    * lands in the top band. */
  def ratioBandSqlExpr(num: String, den: String, bands: Int): String =
    s"least(($num * ${bands}L) div $den, ${bands - 1}L)"

  /** DuckDB twin of [[ratioBandSqlExpr]] (`//` floors like `div`
    * truncates — arguments are non-negative at every call site). */
  def ratioBandDuck(num: String, den: String, bands: Int): String =
    s"least(($num * $bands) // $den, ${bands - 1})"

  /** The band's lower share edge in ppm: `(band·1e6) div bands`. */
  def bandLoPpmExpr(bands: Int): String = s"(band * 1000000L) div ${bands}L"

  def bandLoPpmDuck(bands: Int): String =
    s"CAST((band * 1000000) // $bands AS BIGINT)"

  /** Stacked parameter-ladder readout: an aggregate row carrying
    * per-point measure columns unfolds to one row per ladder point
    * `(key, measures..., carry...)`. `rows` pairs each point's key
    * literal with its measure column names (in `measureNames` order). */
  def stackLadder(agged: DataFrame, keyName: String,
                  rows: Seq[(Long, Seq[String])],
                  measureNames: Seq[String], carry: Seq[String]): DataFrame =
    agged.select(expr("stack(" + rows.length + ", " +
      rows.map { case (k, cs) => s"${k}L, " + cs.mkString(", ") }
        .mkString(", ") +
      s") AS ($keyName, ${measureNames.mkString(", ")})") +:
      carry.map(col): _*)

  /** SQL twin of [[stackLadder]]: UNION ALL rows over the (one-row or
    * per-group) aggregate CTE `from`. Each row maps output measure
    * name → the point's SQL expression. */
  def stackLadderSqlRows(keyName: String,
                         rows: Seq[(Long, Seq[(String, String)])],
                         carry: Seq[String], from: String): String =
    rows.map { case (k, ms) =>
      (s"SELECT $k AS $keyName" +:
        (ms.map { case (out, e) => s"$e AS $out" } ++ carry))
        .mkString(",\n  ") + s"\nFROM $from"
    }.mkString("\nUNION ALL\n")
}

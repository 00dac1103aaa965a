package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Global plan lint: EVERY gate query's physical plan, one sweep, the
  * invariants the per-query pins assert locally — so a new operator (or
  * a Catalyst upgrade) cannot quietly ship the classic scale-killers.
  *
  * What it catches that per-query pins don't: the pins cover queries
  * someone thought to pin. This covers all of SparkEntry.queries —
  * every future addition is linted the day it lands.
  *
  * Deliberately NOT asserted here: exchange/scan counts (plan-shape
  * details that belong to the per-query pins, where intent is known)
  * and Window partition keys (legitimate windows over aggregate-sized
  * relations partition on low-cardinality keys — only a human knows
  * which relation is bounded; see the x126/x129/x137 rewrites). */
class PlanLintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Audited non-cross BNLJs — each one a BROADCAST SMALL SIDE by
    * design, not an accident (the Cross-tagged 1-row stats joins are
    * allowed implicitly everywhere):
    *  - j14/m6 archive: the needle/path-prefix side broadcasts against
    *    a startswith theta predicate — the designed descendant join
    *    (an equi-join cannot express prefix containment);
    *  - x18/x116: query × K-centroid scoring — conditionless Inner over
    *    the broadcast codebook (K ≤ √n rows), IS the IVF probe step;
    *  - x96: the recall sweep runs that probe once per nProbe setting.
    * A new non-cross BNLJ anywhere else fails the lint until it is
    * audited and added here with its reason. */
  private val auditedNonCrossBnlj = Map(
    "j14_descendant_dirs" -> 1,
    "m6_delete_dir_archive" -> 1,
    "m6_delete_file_archive" -> 1,
    "x18_ann_ivf" -> 1,
    "x116_hard_negatives" -> 1,
    "x96_ann_recall" -> 1)

  /** Audited UNPARTITIONED windows — each one a window over a relation
    * PROVABLY bounded independent of corpus size, with the bound named.
    * x153's first cut is exactly what this catches: a global
    * carry-forward window whose input (|sources|·1e6 grid union) is NOT
    * bounded independent of the corpus shape slipped through because
    * Window partition keys were deliberately unlinted. A new
    * unpartitioned window anywhere fails until its input's bound is
    * argued here. Values are (maxCount, bound argument). */
  private val auditedGlobalWindows: Map[String, (Int, String)] = Map(
    "x84_vocab_growth" -> (3,
      "running union over the 10 fixed sample buckets (≤10 rows)"),
    "x86_zipf_fit" -> (1,
      "rank over the top-1000 token aggregate (≤1000 rows)"),
    "x99_length_ks" -> (1,
      "global CDF over the per-n_chars count aggregate — bounded by " +
        "the distinct-length grid, not the corpus"),
    "x101_hybrid_rrf" -> (2,
      "row_number over the two LIMIT-n candidate lists (≤50 rows each)"),
    "x138_water_fill" -> (2,
      "allocation math over the per-lang token aggregate (≤|langs| rows)"),
    "x144_shard_manifest" -> (1,
      "TwoPhase offset window over the ≤64-row bucket aggregate"),
    "x153_quantile_normalize" -> (3,
      "TwoPhase offset windows over ≤256-row bucket aggregates " +
        "(global grid cumsum ×2 via the union's double evaluation + " +
        "the carry-forward as-of)"))

  test("every unpartitioned Window is audited with its input's bound") {
    // unpartitioned = the first windowspecdefinition argument is an
    // ORDER column (carries an ASC/DESC marker); partition columns
    // precede order columns and carry no marker
    val spec = "windowspecdefinition\\(([^)]*)".r
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val unpart = spec.findAllMatchIn(plan).map(_.group(1)).count { s =>
            val first = s.split(",")(0)
            first.contains(" ASC") || first.contains(" DESC")
          }
          val allowed = auditedGlobalWindows.get(name).map(_._1).getOrElse(0)
          if (unpart > allowed)
            Seq(s"$name: $unpart unpartitioned window(s), $allowed audited")
          else Nil
        } catch {
          case e: Throwable => Seq(s"$name: planning failed: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no gate query plans a CartesianProduct or an unaudited non-cross BNLJ") {
    val crossBnlj =
      "BroadcastNestedLoopJoin Build(Right|Left), Cross".r
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val errs = Seq.newBuilder[String]
          if (plan.contains("CartesianProduct"))
            errs += "CartesianProduct"
          val bnljAll = plan.split("BroadcastNestedLoopJoin").length - 1
          val bnljCross = crossBnlj.findAllIn(plan).length
          val nonCross = bnljAll - bnljCross
          val allowed = auditedNonCrossBnlj.getOrElse(name, 0)
          if (nonCross > allowed)
            errs += s"$nonCross non-cross BNLJ(s), $allowed audited — " +
              "broadcast-small-side by design or a bug; audit before allowing"
          errs.result().map(e => s"$name: $e")
        } catch {
          case e: Throwable => Seq(s"$name: planning failed: ${e.getMessage}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

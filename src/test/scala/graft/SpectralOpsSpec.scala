package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps.Unpinned
import graft.operators.SpectralOps

/** Power-iteration top component (x127): the engine must equal a
  * driver-side reference running the same integer arithmetic, recover a
  * planted dominant direction, and report its Rayleigh eigenvalue. */
class SpectralOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Driver-side reference: identical snap/shrink/normalize integers. */
  private def reference(vecs: Seq[Array[Float]],
                        rounds: Int): (Array[Long], Long) = {
    val dim = vecs.head.length
    val x = vecs.map(_.map(f => math.floor(f.toDouble * 1e4 + 0.5).toLong))
    def shr(c: Long, by: Long): Long =
      if (c < 0) -((-c) / by) else c / by
    var v = Array.fill(dim)(1000000L)
    var lambda = 0L
    for (r <- 1 to rounds) {
      val d = x.map(row => row.indices.map(j => row(j) * v(j)).sum)
      if (r == rounds) {
        val num = d.map(di => BigInt(di) * BigInt(di)).sum
        val den = v.map(vj => vj * vj).sum
        lambda = (BigDecimal(num) / BigDecimal(den) + 0.5)
          .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      }
      val ds = d.map(shr(_, 1048576L))
      val w = (0 until dim).map(j =>
        x.indices.map(i => x(i)(j) * ds(i)).sum).toArray
      val wscale = math.max(w.map(math.abs).max / 1000000L, 1L)
      val s = w.map(shr(_, wscale))
      val n2 = s.map(sj => sj * sj).sum
      v = s.map(sj =>
        if (n2 > 0)
          math.floor(sj.toDouble / math.sqrt(n2.toDouble) * 1e6 + 0.5).toLong
        else 0L)
    }
    (v, lambda)
  }

  /** rank-1-plus-noise fixture: vec_i = α_i·u + ε_i. */
  private def planted(n: Int, dim: Int): Seq[Array[Float]] = {
    val u = {
      val raw = (1 to dim).map(j => 1.0 + (j % 5) * 0.3)
      val norm = math.sqrt(raw.map(r => r * r).sum)
      raw.map(r => (r / norm)).toArray
    }
    (0 until n).map { i =>
      val alpha = 0.5 + (i % 7) * 0.05
      val eps = (0 until dim).map(j => ((i * 31 + j * 17) % 11 - 5) * 0.002)
      u.indices.map(j => (alpha * u(j) + eps(j)).toFloat).toArray
    }
  }

  private def embDf(vecs: Seq[Array[Float]]) = {
    val s = spark
    import s.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("engine equals the driver-side integer reference exactly") {
    val vecs = planted(40, 8)
    val rows = SpectralOps.topComponent(embDf(vecs), rounds = 4,
      state = Unpinned).collect().sortBy(_.getLong(0))
    val (refV, refLam) = reference(vecs, 4)
    assert(rows.length === 8)
    rows.foreach { r =>
      val pos = r.getLong(0).toInt
      assert(r.getAs[Long]("v_micro") === refV(pos),
        s"pos $pos: engine ${r.getAs[Long]("v_micro")} != ref ${refV(pos)}")
      assert(r.getAs[Long]("lambda_unit") === refLam)
    }
  }

  test("Local state (co-partitioned pin) equals the reference exactly") {
    // the round-19 shape: m pinned via pinPartitioned + declared
    // hashpartitioning(vec_id), per-round w pinned — placement must not
    // move a bit of the exact integer arithmetic
    val vecs = planted(40, 8)
    val rows = SpectralOps.topComponent(embDf(vecs), rounds = 4)
      .collect().sortBy(_.getLong(0))
    val (refV, refLam) = reference(vecs, 4)
    assert(rows.length === 8)
    rows.foreach { r =>
      val pos = r.getLong(0).toInt
      assert(r.getAs[Long]("v_micro") === refV(pos))
      assert(r.getAs[Long]("lambda_unit") === refLam)
    }
  }

  test("a planted dominant direction is recovered (|cos| > 0.99)") {
    val vecs = planted(60, 16)
    val rows = SpectralOps.topComponent(embDf(vecs), rounds = 4,
      state = Unpinned).collect().sortBy(_.getLong(0))
    val v = rows.map(_.getAs[Long]("v_micro").toDouble)
    val raw = (1 to 16).map(j => 1.0 + (j % 5) * 0.3)
    val un = math.sqrt(raw.map(r => r * r).sum)
    val u = raw.map(_ / un)
    val cos = v.indices.map(j => v(j) * u(j)).sum /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(u.map(x => x * x).sum))
    assert(math.abs(cos) > 0.99, s"cos(v, planted)=$cos")
  }

  test("corrected pairs: the shared component stops dominating the verdict") {
    // all four vectors ride a strong shared component c, with ZERO-MEAN
    // residuals ±u1 / ±u2 (u1 ⊥ u2 ⊥ c) — so the top direction is
    // exactly c and correction exposes the residual geometry: raw
    // cosines are uniformly high (c dominates every pair), |corrected|
    // is ~1 exactly for pairs sharing a residual LINE and ~0 across.
    // (Residuals with a nonzero mean tilt the top eigenvector toward
    // that mean — rank-1 ABTT removes it too; that is the method's
    // documented behavior, not a bug, hence the balanced fixture.)
    val c = Array(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f).map(_ / math.sqrt(8).toFloat)
    val u1 = Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f).map(_ / math.sqrt(8).toFloat)
    val u2 = Array(1f, 1f, -1f, -1f, 1f, 1f, -1f, -1f).map(_ / math.sqrt(8).toFloat)
    def mk(base: Array[Float], scale: Float) =
      c.indices.map(j => 3f * c(j) + scale * base(j)).toArray
    val vecs = Seq(mk(u1, 1f), mk(u1, -1f), mk(u2, 1f), mk(u2, -1f))
    // Local (checkpointed) state: Unpinned lineage doubles per round
    // through the two matrix joins — plan-size exponential, fine for the
    // 2-consumer tests above, pathological once pairs re-join features
    val rows = SpectralOps.correctedDupPairs(embDf(vecs),
      SpectralOps.topComponent(embDf(vecs), rounds = 4),
      threshold = 0.40).collect()
    assert(rows.length === 6, "all C(4,2) pairs exceed the raw threshold")
    rows.foreach { r =>
      val a = r.getAs[Long]("vec_a"); val b = r.getAs[Long]("vec_b")
      val corr = r.getAs[Double]("cos_corrected")
      val sameLine = (a < 2) == (b < 2)
      assert(r.getAs[Double]("cos_sim") > 0.75,
        s"($a,$b): shared component must dominate the raw cosine")
      if (sameLine)
        assert(math.abs(corr) > 0.95,
          s"($a,$b): shared residual line must survive correction: $corr")
      else
        assert(math.abs(corr) < 0.2,
          s"($a,$b): orthogonal residuals must collapse: $corr")
    }
  }

  test("rank-1 Rayleigh eigenvalue matches the closed form within 2%") {
    // pure rank-1 (no noise): λ must be ~1e8·Σα² in snap units
    val dim = 8
    val u = {
      val raw = (1 to dim).map(_.toDouble)
      val norm = math.sqrt(raw.map(r => r * r).sum)
      raw.map(_ / norm).toArray
    }
    val alphas = (0 until 50).map(i => 0.4 + (i % 5) * 0.1)
    val vecs = alphas.map(a => u.map(uj => (a * uj).toFloat))
    val lam = SpectralOps.topComponent(embDf(vecs), rounds = 3,
      state = Unpinned).collect().head.getAs[Long]("lambda_unit")
    val expected = 1e8 * alphas.map(a => a * a).sum
    assert(math.abs(lam - expected) / expected < 0.02,
      s"lambda $lam vs closed-form $expected")
  }
}

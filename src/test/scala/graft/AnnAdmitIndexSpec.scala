package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnAdmitIndex, IvfOps}

/** Epoch-sharded ANN admission index: SemDeDup verdicts against the
  * live epoch union, contraction on extension (only admitted vectors
  * post), replay idempotency by name — surviving tail compaction via
  * covered.json — and the NearDupIndex tail-compaction invariants
  * (base never rewritten, probes identical across the merge). */
class AnnAdmitIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val model = IvfOps.IvfModel(
    Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)))
  private val tau = 950000L

  private def freshRoot(): String =
    Files.createTempDirectory("annx_spec").toString

  private def emb(rows: (Long, Array[Double])*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  private def verdicts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("vec_id") ->
      ((r.getAs[String]("verdict"),
        Option(r.getAs[java.lang.Long]("anchor_id")).map(_.toLong)))).toMap

  test("admit: semantic dup rejects at tau, novel admits; extension " +
      "posts only admitted vectors; replay is a name no-op") {
    val root = freshRoot()
    AnnAdmitIndex.buildIndex(
      emb(1L -> Array(1.0, 0.0, 0.0), 2L -> Array(0.0, 1.0, 0.0)),
      model, root)
    val batch = emb(
      10L -> Array(1.0, 0.0, 0.0),  // exact vector of 1: dup_embed
      11L -> Array(0.6, 0.8, 0.0),  // cos 0.8 vs 2: admitted
      12L -> Array(0.1, 0.0, 1.0))  // near-orthogonal: admitted
    val got = verdicts(AnnAdmitIndex.admit(batch, root, tau, nProbe = 1))
    assert(got(10L) === (("dup_embed", Some(1L))), s"$got")
    assert(got(11L)._1 === "admitted" && got(12L)._1 === "admitted",
      s"$got")
    assert(AnnAdmitIndex.extendEpoch(batch, root, "b0", tau, nProbe = 1))
    val eps = AnnAdmitIndex.committedEpochs(root)
    assert(eps.size === 2)
    val posted = spark.read.parquet(s"$root/${eps(1)}/postings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(posted === Set(11L, 12L),
      s"only ANN-admitted vectors may post (contraction): $posted")
    assert(!AnnAdmitIndex.extendEpoch(batch, root, "b0", tau, nProbe = 1),
      "a replayed batch name must be a no-op")
    assert(AnnAdmitIndex.committedEpochs(root) === eps)
    // the next batch sees batch-0 admissions: 11's int8 twin rejects
    val got2 = verdicts(AnnAdmitIndex.admit(
      emb(20L -> Array(0.6, 0.8, 0.0)), root, tau, nProbe = 1))
    assert(got2(20L) === (("dup_embed", Some(11L))),
      s"earlier batch's admitted vector must anchor the rejection: $got2")
  }

  test("empty embedding batch: admit returns no rows, extension commits " +
      "an empty epoch, later probes unchanged — the all-null-embedding " +
      "micro-batch a live stream will eventually deliver") {
    val root = freshRoot()
    AnnAdmitIndex.buildIndex(emb(1L -> Array(1.0, 0.0, 0.0)), model, root)
    val none = emb().limit(0)
    assert(AnnAdmitIndex.admit(none, root, tau, nProbe = 1).count() === 0L)
    assert(AnnAdmitIndex.extendEpoch(none, root, "b0", tau, nProbe = 1))
    assert(AnnAdmitIndex.committedEpochs(root).size === 2)
    assert(!AnnAdmitIndex.extendEpoch(none, root, "b0", tau, nProbe = 1),
      "replay of the empty batch stays a name no-op")
    val got = verdicts(AnnAdmitIndex.admit(
      emb(10L -> Array(1.0, 0.0, 0.0)), root, tau, nProbe = 1))
    assert(got(10L) === (("dup_embed", Some(1L))),
      s"probes through the empty epoch must still work: $got")
  }

  test("tail compaction: base untouched, probes identical, covered " +
      "names keep replay a no-op; retraction via compact(dropVecIds)") {
    val root = freshRoot()
    AnnAdmitIndex.buildIndex(
      emb(1L -> Array(1.0, 0.0, 0.0), 2L -> Array(0.0, 1.0, 0.0)),
      model, root)
    assert(AnnAdmitIndex.extendEpoch(emb(11L -> Array(0.6, 0.8, 0.0)),
      root, "b0", tau, nProbe = 1))
    assert(AnnAdmitIndex.extendEpoch(emb(12L -> Array(0.1, 0.0, 1.0)),
      root, "b1", tau, nProbe = 1))
    val base = AnnAdmitIndex.committedEpochs(root).head
    val baseListing = Files.walk(Paths.get(root, base))
      .map[String](_.toString).sorted().toArray
    val probe = emb(30L -> Array(0.6, 0.8, 0.0),
      31L -> Array(0.1, 0.0, 1.0), 32L -> Array(0.0, 1.0, 0.0))
    def admits() =
      verdicts(AnnAdmitIndex.admit(probe, root, tau, nProbe = 2))
    val before = admits()
    assert(before(30L)._1 === "dup_embed" && before(31L)._1 === "dup_embed"
      && before(32L)._1 === "dup_embed", s"$before")
    AnnAdmitIndex.compactTail(spark, root, targetRows = 1L)
    val eps = AnnAdmitIndex.committedEpochs(root)
    assert(eps.size === 2 && eps.head === base,
      s"base + merged tail: $eps")
    assert(Files.walk(Paths.get(root, base)).map[String](_.toString)
      .sorted().toArray.sameElements(baseListing),
      "tail compaction must never rewrite the base epoch")
    assert(admits() === before,
      "probes must be identical across the tail merge")
    assert(AnnAdmitIndex.hasEpoch(root, "b0") &&
      AnnAdmitIndex.hasEpoch(root, "b1"),
      "covered.json must keep folded batch names accounted")
    assert(!AnnAdmitIndex.extendEpoch(emb(11L -> Array(0.6, 0.8, 0.0)),
      root, "b0", tau, nProbe = 1),
      "a replayed folded batch must be a no-op")
    // takedown: retract vector 11 through the compaction rewrite —
    // its int8 twin stops anchoring rejections, atomically at promote
    val s = spark
    import s.implicits._
    AnnAdmitIndex.compact(spark, root, targetRows = 1L,
      dropVecIds = Some(Seq(11L).toDF("vec_id")))
    val after = admits()
    assert(after(30L)._1 === "admitted",
      s"the retracted vector must stop rejecting: $after")
    assert(after(31L) === before(31L) && after(32L) === before(32L),
      s"survivors keep anchoring: $after")
    assert(AnnAdmitIndex.hasEpoch(root, "b0"),
      "coverage carries transitively through the full compact")
  }
}

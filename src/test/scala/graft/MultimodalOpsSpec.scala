package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

/** Multimodal plumbing: schemas, batch shapes, and the deterministic stub
  * codec (the Spark-side pipeline is real; only decode is faked). */
class MultimodalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def payloads = {
    val s = spark
    import s.implicits._
    Seq((1L, "image-bytes-one"), (2L, "image-bytes-two"), (3L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
  }

  test("extractMediaMeta: schema, determinism, byte counts") {
    val meta = MultimodalOps.extractMediaMeta(payloads)
    assert(meta.schema === MultimodalOps.mediaMetaSchema)
    val rows = meta.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(rows(1L)._1 === "image-bytes-one".length)
    // deterministic: same payload → same fake dimensions on re-run
    val again = MultimodalOps.extractMediaMeta(payloads).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(rows === again)
    // dimensions in the documented fake ranges
    rows.values.foreach { case (_, w, h, fmt) =>
      assert(w >= 64 && w < 1920 && h >= 64 && h < 1080)
      assert(Set("jpeg", "png", "webp").contains(fmt))
    }
  }

  test("stubResize prepends the dimension header and stamps columns") {
    val out = MultimodalOps.stubResize(payloads, 224, 224)
    val r = out.filter(col("doc_id") === 1L).head()
    assert(r.getAs[Int]("width") === 224 && r.getAs[Int]("height") === 224)
    val bytes = r.getAs[Array[Byte]]("payload")
    val header = new String(bytes.take(8).map("%02x".format(_)).mkString.toCharArray)
    assert(bytes.length === 8 + "image-bytes-one".length)
    assert(new String(bytes.drop(8)) === "image-bytes-one")
  }

  test("stubFrameSample chunks payloads with stride") {
    val frames = MultimodalOps.stubFrameSample(payloads, frameBytes = 4, stride = 2)
    val f1 = frames.filter(col("doc_id") === 1L)
      .collect().map(r => r.getInt(1) -> new String(r.getAs[Array[Byte]](2)))
    // "image-bytes-one" = 15 bytes → chunks of 4 → indices 0..3, stride 2 → 0,2
    assert(f1.map(_._1).sorted.toSeq === Seq(0, 2))
    assert(f1.toMap.apply(0) === "imag")
    assert(f1.toMap.apply(2) === "tes-")
  }

  test("stubFeatures emits fixed-dim deterministic embeddings per payload") {
    val a = MultimodalOps.stubFeatures(payloads, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = MultimodalOps.stubFeatures(payloads, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (id, v) =>
      assert(v.length === 16)
      assert(v === b(id)) // deterministic
      assert(v.forall(x => x >= -1f && x <= 1f))
    }
    // distinct payloads → distinct features
    assert(a.values.toSeq.distinct.size === a.size)
  }
}

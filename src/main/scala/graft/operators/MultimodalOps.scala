package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batched per partition.
  *
  * The real media codecs are NOT in this container, so the decode step is
  * a clearly-marked deterministic STUB (`stubDecode`) — it derives fake
  * dimensions from an md5 of the payload, which keeps the whole pipeline
  * (schema, partition-batched execution, output shape) real, tested, and
  * oracle-checkable. Swapping in a real decoder changes only the body of
  * `stubDecode`.
  *
  * Scale: `mapPartitions` processes each partition's rows through one
  * reusable decoder instance (the expensive-setup pattern a JNI codec
  * needs); payload bytes never hit the driver; output is a narrow
  * projection so downstream pruning works.
  */
object MultimodalOps {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** STUB decoder — deterministic fake dimensions from the payload hash.
    * Replace the body with a real codec call in production. Mirrors
    * [[stubDecodeSql]]; keep in sync. */
  def stubDecode(payload: Array[Byte]): (Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val width = (64L + h % 1856L).toInt
    val height = (64L + (h / 1856L) % 1016L).toInt
    val format = (h % 3L) match {
      case 0L => "jpeg"
      case 1L => "png"
      case _ => "webp"
    }
    (width, height, format)
  }

  /** DuckDB twin of the stub decode over a text-derived payload. */
  def stubDecodeSql(textExpr: String): (String, String, String) = {
    val h = s"CAST(concat('0x', substr(md5($textExpr), 1, 15)) AS BIGINT)"
    (s"CAST(64 + $h % 1856 AS INT)",
      s"CAST(64 + ($h // 1856) % 1016 AS INT)",
      s"CASE $h % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END")
  }

  /** Batched metadata extraction over a binary column: one decoder per
    * partition, rows streamed through it. Input needs (doc_id: long,
    * payload: binary). */
  def extractMediaMeta(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // one decoder instance per partition (JNI-codec setup pattern)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, fmt) = stubDecode(payload)
          Row(id, payload.length, w, h, fmt)
        }
      }
    session.createDataFrame(rdd, mediaMetaSchema)
  }

  /** STUB resize: the Spark-side contract of an image-resize stage —
    * output payload is a deterministic function of (payload, w, h) so
    * tests can assert the full pipeline. */
  def stubResize(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("payload",
      concat(to_binary(lit(f"$width%08x$height%08x"), lit("hex")), col("payload")))
      .withColumn("width", lit(width)).withColumn("height", lit(height))

  /** STUB feature extraction: payload → fixed-dim embedding, one "model"
    * instance per partition (the batched-inference pattern — swap the
    * md5-expansion body for a real encoder call; the Spark-side contract
    * is the schema, the per-partition model reuse, and the batch shape). */
  def stubFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val session = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // one model instance per partition (expensive-setup pattern)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val feats = Array.tabulate(dim) { i =>
            md.reset()
            md.update(payload)
            md.update(i.toByte)
            (((md.digest()(0) & 0xff) - 128) / 128.0).toFloat
          }
          Row(id, feats.toSeq)
        }
      }
    session.createDataFrame(rdd, schema)
  }

  /** STUB frame sampling: every `stride`-th chunk of the payload stands in
    * for a video frame — real chunked iteration, fake frame decode. */
  def stubFrameSample(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val session = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val frames = payload.grouped(frameBytes).zipWithIndex
          frames.collect { case (chunk, i) if i % stride == 0 => Row(id, i, chunk) }
        }
      }
    session.createDataFrame(rdd, schema)
  }
}

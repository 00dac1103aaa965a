package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{IvfOps, SimilarityOps}

/** Incremental ANN index maintenance — the online half of the persisted
  * IVF index contract ([[IvfOps.saveIndex]] / [[IvfOps.adcTopKFromIndex]]):
  * embeddings arriving on a stream are assigned to their inverted list
  * and int8-coded AS THEY ARRIVE, appended to the postings table under
  * the frozen coarse quantizer. Queries keep probing the same postings
  * path and see new vectors at micro-batch latency; the float corpus is
  * never re-read.
  *
  * Shape: one stateless per-row map (broadcast K×dim centroids — no
  * join, no window, no state store), then Spark's transactional file
  * sink — the `_spark_metadata` manifest gives exactly-once file
  * semantics across restarts, so a replayed micro-batch can't duplicate
  * postings. Re-training the quantizer (when [[IvfOps.clusterStats]]
  * says the codebook stopped fitting) is an offline rebuild by design:
  * centroid identity is what makes the accumulated postings valid, so a
  * model swap must swap the whole index directory, never splice.
  *
  * Arithmetic parity with the offline builder is bit-exact: the same
  * [[IvfOps.IvfModel.nearest]] assignment and the same
  * `floor(x / norm * 127 + 0.5)` code op-order as
  * [[SimilarityOps.quantizeEmbeddings]] — AnnIndexStreamSpec pins
  * stream-built == offline-rebuilt postings AND probe-result equality. */
object AnnIndexStream {

  /** `(vec_id, centroid_id, qcode)` posting rows for a batch OR
    * streaming embedding relation under a frozen model — one stateless
    * mapper, everything computed per row. */
  def postings(emb: DataFrame, model: IvfOps.IvfModel): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val n = math.sqrt(SimilarityOps.dotLocal(v, v))
        val q =
          if (n == 0) v.map(_ => 0)
          else v.map(x => math.floor(x / n * 127d + 0.5d).toInt)
        (id, bc.value.nearest(v, 1).head, q)
      }
      .toDF("vec_id", "centroid_id", "qcode")
  }

  /** Maintain the postings of the index at `dir` from a streaming
    * embedding source. `dir/centroids` must already hold the frozen
    * model ([[IvfOps.saveCentroids]]). */
  def ingest(stream: DataFrame, model: IvfOps.IvfModel, dir: String,
             checkpointDir: String): StreamingQuery =
    postings(stream, model).writeStream
      .format("parquet")
      .option("path", s"$dir/postings")
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}

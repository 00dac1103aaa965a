package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B: native ws tokenizer vs regex split, same session,
  * interleaved, checksum-consumed (Test scope only). */
object TokBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
    def consume(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(xxhash64(c).as("h")).agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val splitForm = split(trim(col("text")), graft.operators.TextOps.wsRunRegex)
    val nativeForm = graft.functions.TextExpressions.wsTokensFast(col("text"))
    // warm both
    consume(splitForm); consume(nativeForm)
    for (i <- 1 to 3) {
      val a = consume(splitForm)
      val b = consume(nativeForm)
      println(f"[tokbench] round $i split=$a%.3f native=$b%.3f")
    }
    spark.stop()
  }
}

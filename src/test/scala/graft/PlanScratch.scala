package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan inspector for iterating on plan shapes (Test scope only). */
object PlanScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("x19_training_selection", "x2_lang_id")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val splits = "split\\(trim\\(".r.findAllIn(plan).length
      println(s"=== $n  split(trim( count = $splits ===")
      println(plan)
    }
    spark.stop()
  }
}

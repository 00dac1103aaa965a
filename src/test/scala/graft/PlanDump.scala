package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      println(s"=====BEGIN $n=====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"=====END $n=====")
    }
    spark.stop()
  }
}

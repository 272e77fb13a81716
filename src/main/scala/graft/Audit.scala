package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.queryExecution.toRdd.count() // executes THIS QueryExecution, finalizing its AQE plan
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan.toString
          case p => p.toString
        }
        val codegenSpans = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        val bcast = "BroadcastHashJoin|BroadcastNestedLoop".r.findAllIn(plan).size
        val smj = "SortMergeJoin".r.findAllIn(plan).size
        val ex = "Exchange (hash|range)partitioning".r.findAllIn(plan).size
        val topk = if (plan.contains("TakeOrderedAndProject")) " TOP-K" else ""
        println(s"[audit] $name: codegen=$codegenSpans bcast=$bcast smj=$smj shuffles=$ex$topk")
      } catch { case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

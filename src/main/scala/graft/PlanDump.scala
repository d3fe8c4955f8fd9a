package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"########## $name")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(30000))
    }
    spark.stop()
  }
}

package graft
import graft.core.Graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Graft.localSession(cores = 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      println(s"========== $name ==========")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev harness (not part of the shipped surface, like [[Scratch]]):
  * print one named query's formatted physical plan — the source of the
  * PLANS.md sections. Usage: runMain graft.PlanDump <queryName> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = AdtContext.engineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    println("=====PLAN=====")
    println(df.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}

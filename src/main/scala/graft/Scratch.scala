package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one named query in isolation (not part of the
  * shipped surface). Usage: runMain graft.Scratch <queryName> [sfDir] [n] */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q42_dedup_minhash_lsh"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = AdtContext.engineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup on q1 to absorb codegen start-up
    SparkEntry.queries("q1_agg")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      println(f"[scratch] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main for plan inspection (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warmup
    SparkEntry.queries("q1_agg")(spark, d).write.format("noop").mode("overwrite").save()

    Seq("q26_string_funcs", "q53_approx_sketches", "q42_dedup_minhash_lsh").foreach { q =>
      time(s"$q run1") {
        SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      }
      time(s"$q run2") {
        SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      }
    }
    time("tables.register alone")(Tables.register(spark, d))
    time("tables.register again")(Tables.register(spark, d))
    spark.stop()
  }
}

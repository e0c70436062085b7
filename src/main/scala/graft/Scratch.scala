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
    def run(q: String): Unit =
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()

    time("q54 cold")(run("q54_json_props"))
    time("q54 warm")(run("q54_json_props"))
    // build up the caches the dedup queries leave behind
    time("q41")(run("q41_dedup_ngram_jaccard"))
    time("q42")(run("q42_dedup_minhash_lsh"))
    time("q43")(run("q43_dedup_simhash"))
    time("q80")(run("q80_dedup_chargram"))
    time("q81")(run("q81_pipeline_e2e"))
    time("q54 after dedups")(run("q54_json_props"))
    println("cached tables: " + spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Fixtures

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Measurement choices:
  *  - results are materialized through the `noop` DSv2 sink, not
  *    `count()` — count lets Catalyst prune every computed column, which
  *    would under-measure projection/function work;
  *  - source fixtures (CSV/NDJSON/delta derivatives of the corpus) are
  *    generated before the clock starts, so timings measure scans, not
  *    one-time fixture creation;
  *  - one untimed warmup query absorbs JVM/codegen start-up cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fixtures + JIT warmup, untimed
    try {
      Fixtures.nationCsv(spark, sfDir)
      Fixtures.eventsNdjson(spark, sfDir)
      Fixtures.lineitemPartitioned(spark, sfDir)
      Fixtures.deltaNation(spark, sfDir)
      Fixtures.deltaNationPartitioned(spark, sfDir)
      Fixtures.deltaNationDv(spark, sfDir)
      Fixtures.deltaNationCheckpoint(spark, sfDir)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] fixture warmup failed: ${e.getMessage}")
    }
    try SparkEntry.queries("q1_agg")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // queries may cache intermediates (dedup signatures etc.); drop them
      // so per-query timings are independent and memory doesn't accumulate
      // across the 86-query run.
      spark.catalog.clearCache()
      name -> sec
    }
    // ms precision halves the line width; the JSON must be the very last
    // stdout line (the driver tail-captures it) and is also written to
    // /tmp/graft_bench.json as a fallback.
    def ms(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_bench.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    System.out.flush()
    println(line)
    System.out.flush()
  }
}

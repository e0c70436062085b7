package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** TEMPORARY dev-only A/B harness (never committed / never part of the
  * driver surface): interleaves two inline query variants rep-by-rep in
  * one JVM so box noise hits both sides equally.
  * Usage: runMain graft.AbHarness <sfDir> <reps>
  */
object AbHarness {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = AdtContext.engineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "1m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new AtomicInteger(0); val tasks = new AtomicInteger(0)
    val execMs = new AtomicLong(0L); val gcMs = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          execMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        }
      }
    })

    def h60(c: org.apache.spark.sql.Column) =
      graft.functions.Md5Long.md5_60(c)

    // ---- variant A: r21 shape (pinned repartition(sp, cv) on chunks)
    def qA(s: SparkSession, d: String): DataFrame = {
      val sp = s.conf.get("spark.sql.shuffle.partitions").toInt
      val toks = Tables.t(s, d, "documents")
        .select($"doc_id", explode(split($"text", " ")).as("w"))
        .repartition(sp, $"doc_id")
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("cnt"))
        .select($"doc_id", $"cnt", h60($"w").as("h"))
      val bitAggs = (0 until 60).map { j =>
        sum($"cnt" * (expr(s"shiftright(h, $j) & 1") * 2 - 1)).as(s"v$j")
      }
      val sigWide = toks.groupBy($"doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      val sig = sigWide.select($"doc_id",
        (0 until 60).map(j =>
          when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("sim")).cache()
      val chunks = sig.select($"doc_id", $"sim",
        explode(expr("sequence(0, 8)")).as("c"))
        .withColumn("cv",
          expr("(sim div CAST(pow(2, 7 * c) AS BIGINT)) % 128"))
        .repartition(sp, $"cv")
      chunks.as("x")
        .join(chunks.as("y"),
          $"x.c" === $"y.c" && $"x.cv" === $"y.cv" &&
            $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("d1"), $"y.doc_id".as("d2"),
          expr("bit_count(x.sim ^ y.sim)").cast("int").as("hamming"))
        .filter($"hamming" <= 8)
        .distinct()
        .orderBy($"d1", $"d2")
    }

    // ---- variant B: current SparkEntry q43 (no cv pin)
    def qB(s: SparkSession, d: String): DataFrame =
      SparkEntry.queries("q43_dedup_simhash")(s, d)

    // warmup
    SparkEntry.queries("q1_agg")(spark, sfDir).write
      .format("noop").mode("overwrite").save()

    def run(name: String, fn: (SparkSession, String) => DataFrame): Unit = {
      jobs.set(0); tasks.set(0); execMs.set(0L); gcMs.set(0L); cpuNs.set(0L)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200L)
      println(f"[ab] $name: $secs%.2f s  jobs=${jobs.get} tasks=${tasks.get} " +
        f"execRun=${execMs.get / 1000.0}%.2f s cpu=${cpuNs.get / 1e9}%.2f s " +
        f"gc=${gcMs.get / 1000.0}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }

    (1 to reps).foreach { i =>
      run(s"A(pin-cv) rep$i", qA)
      run(s"B(no-pin) rep$i", qB)
    }
    spark.stop()
  }
}

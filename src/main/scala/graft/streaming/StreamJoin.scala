package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream-stream event-time interval join — the attribution shape (click
  * followed by a purchase from the same user within 30 minutes), part of
  * the engine's forward streaming surface like [[EventStream]] (the
  * reference is batch-only, SURVEY §2.4).
  *
  * Both sides carry watermarks and the join condition bounds event time on
  * BOTH streams, so Spark can expire join state: a click older than the
  * purchase watermark minus 30 minutes can never match again and is
  * dropped. Unbounded state is the failure mode of naive stream joins at
  * scale — the watermark + interval bound is what makes this runnable
  * forever on a 1000-executor cluster.
  */
object StreamJoin {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Streaming source over a directory of event parquet files whose `ts`
    * is an ordinary (micro-second, UTC-adjusted) parquet timestamp — i.e.
    * a feed directory of files written by this engine or any normal
    * producer. The CORPUS file events.parquet is not read through this
    * schema — it goes through [[EventStream.readEvents]] or
    * `graft.Tables.t`, which sniff the footer and normalize `ts` across
    * both corpus generations (timestamp[ns]-as-long and
    * timestamp[us]/NTZ). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Clicks joined to same-user purchases within 30 minutes. Works
    * identically on streaming and batch frames — the spec asserts the
    * two agree. */
  def attribute(events: DataFrame, watermarked: Boolean): DataFrame = {
    def side(tpe: String, suffix: String) = {
      val s = events.filter(col("event_type") === tpe)
        .select(col("event_id").as(s"id_$suffix"),
          col("ts").as(s"ts_$suffix"),
          col("user_id").as(s"user_$suffix"))
      if (watermarked) s.withWatermark(s"ts_$suffix", "1 hour") else s
    }
    side("click", "c").join(side("purchase", "p"),
      expr("""user_c = user_p AND
              ts_p > ts_c AND ts_p <= ts_c + INTERVAL 30 MINUTES"""))
      .select(col("id_c").as("click_id"), col("id_p").as("purchase_id"),
        col("user_c").as("user_id"))
  }

  /** Replay a finite directory through the streaming join and collect. */
  def runToCompletion(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    val q = attribute(readEvents(spark, dir), watermarked = true)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}

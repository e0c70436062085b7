package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table.
  *
  * The reference is batch-only (SURVEY §2.4) — this module is part of the
  * engine's forward surface: the same time-bucketed aggregation the batch
  * path runs (queries.Funcs q38) expressed as a streaming query with a
  * watermark, so the identical logic can run over a live feed at scale
  * (state is bounded by the watermark; the shuffle key is the window ×
  * event_type pair).
  *
  * Tested by replaying the parquet corpus through the file source and
  * comparing against the batch answer (StreamingSpec).
  */
object EventStream {

  /** events.parquet has shipped as timestamp[ns] and timestamp[us]/NTZ;
    * the streaming source needs a declared schema, so we sniff the
    * footer once (graft.Tables.eventsTsType — driver-side,
    * metadata-only), declare the matching raw schema, and normalize
    * through the SAME graft.Tables.normalizeEventsTs the batch reader
    * uses, so batch and stream can never desynchronize on a corpus
    * generation. */
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming package's cents rounding — floor(x·100 + 0.5), the
    * one spelling shared by the windowed aggregate and sessionization so
    * stream and batch kernels can never disagree on a boundary value. */
  private[streaming] def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100 + lit(0.5)).cast("long")

  /** Streaming source over the corpus file(s). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsType = graft.Tables.eventsTsType(spark, dir)
    graft.Tables.normalizeEventsTs(spark.readStream
      .schema(rawSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }

  /** Daily windowed counts + cents sums per event type, 1-day watermark.
    * Append-mode compatible: results emit when the watermark passes the
    * window end. */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("value"))).as("cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("cents"))

  /** Stream-static enrichment: the live event feed joined against a
    * batch dimension table (the most common production streaming shape —
    * per-event dimension lookup). Spark plans the static side as an
    * ordinary broadcast-able batch relation re-resolved per micro-batch;
    * no streaming state is created, so this scales exactly like the
    * batch join. The dim here is the per-user segment cut the batch path
    * would compute with the same expression. */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        coalesce(col("segment"), lit("unknown")).as("segment"))

  /** Run the streaming query to completion over the (finite) file source
    * via the memory sink; returns the collected result table.
    *
    * Output mode is `complete` here ONLY because this is a finite replay
    * into a memory sink that must observe every window, including the
    * last one, which no later data will ever push past the watermark —
    * complete mode retains all aggregation state, so the module's
    * bounded-state claim does NOT apply to this helper. A production
    * deployment of [[dailyCounts]] on a live feed runs `append` (the
    * watermarked plan supports it), where finalized windows emit once
    * and their state is purged. */
  def runToCompletion(spark: SparkSession, dir: String,
      queryName: String = "events_daily"): DataFrame = {
    val q = dailyCounts(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}

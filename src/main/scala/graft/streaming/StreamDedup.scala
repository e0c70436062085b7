package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact deduplication — the ingest-time twin of the batch
  * digest dedup (queries.Dedup q40), part of the engine's forward surface
  * like [[EventStream]] (the reference is batch-only, SURVEY §2.4).
  *
  * `dropDuplicates` on the content digest keeps the FIRST document ever
  * seen per digest across micro-batches; state is one digest per distinct
  * document. For an unbounded feed the bounded-state variant is
  * [[dedupWithinWatermark]]: duplicates are only tracked inside the
  * watermark horizon, which is the standard state/recall trade
  * (`dropDuplicatesWithinWatermark`) — ingest pipelines pair it with a
  * periodic batch dedup sweep over the sealed corpus.
  */
object StreamDedup {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Streaming source over a directory of document parquet files. The
    * DIRECTORY is the contract: every parquet file in it is read as
    * documents (no glob filter — the watermark fixtures name their
    * parts freely); for a mixed-table directory like a raw sf corpus,
    * build the source with `pathGlobFilter` instead (the
    * StreamDsirScore/StreamDeltaIngest pattern). */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1") // duplicates span micro-batches
      .parquet(dir)

  /** Keep-first-ever dedup on the content digest. */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text"))).dropDuplicates("h")

  /** Bounded-state dedup: event time derived deterministically from the
    * document id (1 s per id — the same clock [[StreamNearDup]] uses),
    * duplicates tracked within a 1-hour watermark. The id-proportional
    * clock is what makes the bound REAL: the watermark advances with the
    * ids, so a digest's state is evicted once the frontier passes its
    * event time + 1 h (a modular or constant clock would pin the
    * watermark forever and the "bounded" variant would silently hold
    * state for every digest, exactly like [[dedupExact]]). Event times
    * are offset a day past the epoch — the initial watermark is epoch 0,
    * and a row landing exactly on it would be discarded as late. */
  def dedupWithinWatermark(docs: DataFrame): DataFrame =
    docs
      .withColumn("h", md5(col("text")))
      .withColumn("ts",
        timestamp_micros(col("doc_id") * 1000000L + 86400L * 1000000L))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("h")

  /** Replay a finite directory through the dedup and collect the result. */
  def runToCompletion(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    val q = dedupExact(readDocs(spark, dir))
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

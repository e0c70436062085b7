package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, encode, length}

import graft.operators.Multimodal

/** Streaming audio-envelope signatures — the 1-D modality's ingest
  * twin, completing the multimodal streaming surface next to
  * [[StreamPerceptualDedup]] (image-grid dHash): every arriving blob
  * gets its framed energy / zero-crossing / envelope-digest features
  * at write time, through the SAME JVM kernel the batch q150 operator
  * runs ([[Multimodal.audioFeatures]] — a pure function of the blob,
  * no corpus-level dependency, so stream and batch rows are
  * bit-identical; StreamingSpec pins it).
  *
  * The kernel runs in the typed mapPartitions codec seam (the q50/q94
  * posture — a real decoder initializes per partition and swaps raw
  * bytes for PCM): stateless, partition-parallel, no shuffle, no
  * state store. The full-frames-only filter (length >= 32) is applied
  * before the seam, exactly like batch. */
object StreamAudioSig {

  /** Feature rows for a (doc_id, text) frame — batch or streaming. */
  def features(docs: DataFrame): Dataset[Multimodal.AudioFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .where(length(col("text")) >= 32)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(Multimodal.audioPartition)
  }

  /** Replay a finite documents directory through the signature stage
    * and collect the q150-shaped rows. */
  def runToCompletion(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    val docs = spark.readStream
      .schema(StreamDedup.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val q = features(docs)
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

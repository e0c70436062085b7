package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED write path of an IVF-PQ vector index — what actually
  * runs per arriving embedding at 100 TB ingest:
  *
  *   digest dedup → IVF centroid assignment → PQ encode
  *
  * [[StreamDedup]]'s keep-first digest semantics drop re-delivered
  * vectors (at-least-once upstreams re-deliver), [[StreamAnnAssign]]
  * routes each survivor to its inverted list, and [[StreamPqEncode]]
  * compresses it to m one-byte codes — one streaming query, so a vector
  * is deduped, routed, and compressed in a single pass with no
  * intermediate materialization. The dedup stage is the only stateful
  * one (one digest per distinct vector; the bounded variant is
  * StreamDedup.dedupWithinWatermark's horizon trade); assignment and
  * encode stay stateless literal-fold projections, so the composed plan
  * is scan → dedup state lookup → project → project.
  */
object VectorIngest {

  /** Compose the three stages over a frame carrying quantized vectors
    * in `v` (the Extensions.QV convention shared by the batch family).
    * The digest is md5 over the exact quantized int64s — two vectors
    * dedup iff the BATCH pipeline would see them as identical. */
  def ingest(vectors: DataFrame, cents: Seq[(Long, Seq[Long])],
      cb: Seq[(Int, Long, Seq[Long])]): DataFrame = {
    val deduped = vectors
      .withColumn("h", md5(concat_ws(",", col("v"))))
      .dropDuplicates("h")
    StreamPqEncode.encode(StreamAnnAssign.assign(deduped, cents), cb)
      .select(col("vec_id"), col("c_id"), col("codes"))
  }

  /** Streaming source over a directory of embedding parquet files (the
    * ingest feed shape — multiple files, one micro-batch each, so
    * dedup state must carry across triggers). */
  def readFeed(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(StreamAnnAssign.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Replay a finite feed directory through the composed pipeline and
    * collect (vec_id, c_id, codes). */
  def runToCompletion(spark: SparkSession, dir: String,
      cents: Seq[(Long, Seq[Long])], cb: Seq[(Int, Long, Seq[Long])],
      queryName: String): DataFrame = {
    val quantized = readFeed(spark, dir)
      .select(col("vec_id"), expr(graft.queries.Extensions.QV).as("v"))
    val q = ingest(quantized, cents, cb)
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

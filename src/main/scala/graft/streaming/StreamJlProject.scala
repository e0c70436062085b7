package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Extensions

/** Streaming JL projection — the ingest-time twin of the batch q173
  * compression pass. An embedding pipeline that stores compressed
  * vectors projects each vector ONCE, as it arrives; the batch query's
  * dimension sweep is the offline eval that chose `outDims`, this
  * module is the production fold that applies it.
  *
  * Like StreamAnnAssign/StreamPqEncode, the operator is stateless and
  * shuffle-free: the ±1 sign matrix is a pure function of (row, col)
  * ([[Extensions.jlSignMatrix]] — md5_60-derived, so ANY party
  * recomputes it bit-identically with zero stored state; there is not
  * even a codebook to broadcast), and the projection is a per-row
  * integer fold over one typedLit literal. Scan → project, partition
  * parallel, exactly the q173 kernel — StreamingSpec pins streamed ==
  * independent plain-JVM reference.
  */
object StreamJlProject {

  /** Append `p` = the outDims-length integer projection to a frame
    * carrying quantized vectors in `v` (the q173 column contract:
    * 64-dim BIGINT arrays). */
  def project(vectors: DataFrame, outDims: Int): DataFrame =
    vectors.withColumn("p",
      transform(typedLit(Extensions.jlSignMatrix(outDims)), row =>
        aggregate(sequence(lit(1), lit(64)), lit(0L),
          (acc, i) => acc + element_at(col("v"), i) * element_at(row, i))))

  /** Replay a finite embeddings directory through the projector and
    * collect (vec_id, p). */
  def runToCompletion(spark: SparkSession, dir: String, outDims: Int,
      queryName: String): DataFrame = {
    val quantized = StreamAnnAssign.readVectors(spark, dir)
      .select(col("vec_id"), expr(Extensions.QV).as("v"))
    val q = project(quantized, outDims)
      .select(col("vec_id"), col("p"))
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

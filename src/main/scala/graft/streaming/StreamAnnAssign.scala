package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.DotProductI64.dot_i64

/** Streaming vector ingest with IVF centroid assignment — the streaming
  * twin of the batch q93 probe path, closing the last pipeline family
  * (ANN) without a forward surface (the reference is batch-only,
  * SURVEY §2.4).
  *
  * A vector-ingest pipeline assigns every arriving embedding to its
  * nearest trained centroid at write time, so the batch index (q114's
  * inverted lists) stays current without a full retrain. The centroid
  * set is METADATA (k rows by design — Extensions.centroidK) and a
  * stream cannot run the batch argmin window (no event-time ordering
  * over an unbounded dimension), so the set travels as a LITERAL
  * array-of-structs column and the argmin is a per-row `aggregate` fold
  * over it: stateless, partition-parallel, no shuffle — the streaming
  * plan is scan → project, the cheapest possible shape per arriving
  * vector. Distance and tie-break mirror lloyd2 exactly: exact int64
  * squared euclidean over the quantized vectors, lowest c_id wins ties
  * (the fold keeps the first strictly-smaller distance and the literal
  * is sorted by c_id).
  */
object StreamAnnAssign {

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Streaming source over embedding parquet files. */
  def readVectors(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)

  /** Append `c_id` = nearest centroid (exact int64 squared euclidean,
    * lowest id on ties) to a frame carrying quantized vectors in `v`.
    * `cents` must be sorted by centroid id. */
  def assign(vectors: DataFrame, cents: Seq[(Long, Seq[Long])]): DataFrame = {
    require(cents.nonEmpty, "assign needs a non-empty centroid set")
    require(cents.map(_._1) == cents.map(_._1).sorted,
      "centroid literal must be sorted by c_id (tie-break contract)")
    val centArr: Column = typedLit(cents)
    val v = col("v")
    def dist(cv: Column): Column =
      dot_i64(v, v) - lit(2L) * dot_i64(v, cv) + dot_i64(cv, cv)
    val best = aggregate(
      centArr,
      struct(lit(-1L).as("c"), lit(Long.MaxValue).as("d")),
      (acc, x) => {
        val d = dist(x.getField("_2"))
        when(d < acc.getField("d"),
          struct(x.getField("_1").as("c"), d.as("d"))).otherwise(acc)
      },
      acc => acc.getField("c"))
    vectors.withColumn("c_id", best)
  }

  /** Replay a finite embeddings directory through the assignment and
    * collect (vec_id, c_id). */
  def runToCompletion(spark: SparkSession, dir: String,
      cents: Seq[(Long, Seq[Long])], queryName: String): DataFrame = {
    val quantized = readVectors(spark, dir)
      .select(col("vec_id"), expr(graft.queries.Extensions.QV).as("v"))
    val q = assign(quantized, cents)
      .select(col("vec_id"), col("c_id"))
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

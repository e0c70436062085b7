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
  * vector. The comparison is ordering-equivalent to lloyd2's exact
  * int64 squared euclidean (see [[assign]] — the per-row |v|^2 term is
  * dropped), and ties break identically: lowest c_id wins (the fold
  * keeps the first strictly-smaller distance and the literal is sorted
  * by c_id).
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
    * `cents` must be sorted by centroid id.
    *
    * The comparison drops the loop-invariant dot(v,v) term (a per-row
    * constant cannot change the argmin) and carries each centroid's
    * own norm as a third literal field precomputed on the driver, so
    * the per-vector cost is exactly k dot products — the minimum any
    * assignment can pay. A vector no centroid can score — wrong
    * dimension or a null element makes every dot_i64 NULL — FAILS THE
    * BATCH LOUDLY via raise_error rather than streaming out a sentinel
    * assignment to a centroid that does not exist. */
  def assign(vectors: DataFrame, cents: Seq[(Long, Seq[Long])]): DataFrame = {
    require(cents.nonEmpty, "assign needs a non-empty centroid set")
    require(cents.map(_._1) == cents.map(_._1).sorted,
      "centroid literal must be sorted by c_id (tie-break contract)")
    val centArr: Column = typedLit(cents.map { case (c, cv) =>
      (c, cv, cv.map(x => x * x).sum)
    })
    val v = col("v")
    // dist'(c) = |c|^2 - 2 v·c  ==  |v - c|^2 - |v|^2 (same ordering)
    def dist(x: Column): Column =
      x.getField("_3") - lit(2L) * dot_i64(v, x.getField("_2"))
    val best = aggregate(
      centArr,
      struct(lit(-1L).as("c"), lit(Long.MaxValue).as("d")),
      (acc, x) => {
        val d = dist(x)
        when(d < acc.getField("d"),
          struct(x.getField("_1").as("c"), d.as("d"))).otherwise(acc)
      },
      acc => acc.getField("c"))
    vectors.withColumn("c_id",
      when(best === lit(-1L), raise_error(concat(
        lit("StreamAnnAssign: un-assignable vector (dimension mismatch " +
          "or null element), vec_id="), col("vec_id").cast("string"))))
        .otherwise(best))
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

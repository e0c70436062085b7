package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DotProductI64.dot_i64
import graft.queries.Extensions.{PqM, PqSubDim}

/** Streaming PQ encoding — the write-time twin of the batch q126 encode
  * pass, completing the streaming vector-ingest story: StreamAnnAssign
  * routes an arriving vector to its IVF inverted list, this module
  * compresses it to its PqM one-byte-class codes, and together they are
  * exactly what an IVF-PQ index does per ingested vector at 100 TB.
  *
  * The trained codebook is METADATA (m·ks rows — Extensions.pqKs) and a
  * stream cannot run the batch min(struct) aggregate, so the codebook
  * travels as a LITERAL nested array (indexed by subspace, each entry
  * the subspace's codes sorted by code_id) and the per-subspace argmin
  * is a per-row `aggregate` fold: stateless, partition-parallel, no
  * shuffle — scan → project, like StreamAnnAssign. The comparison is
  * ordering-equivalent to pqTrain's exact int64 squared euclidean (the
  * per-row |sv|² term is loop-invariant and dropped; each code's own
  * norm is precomputed on the driver) and ties break identically:
  * lowest code_id wins (first strictly-smaller fold over the sorted
  * literal).
  */
object StreamPqEncode {

  /** Append `codes` = the PqM-length array of nearest-code ids to a
    * frame carrying quantized vectors in `v`. `cb` must be the full
    * trained codebook sorted by (sub_id, code_id) —
    * Extensions.trainedCodebookSeq's contract. A vector no code can
    * score (dimension mismatch / null element nulls every dot_i64)
    * FAILS THE BATCH LOUDLY via raise_error rather than emitting a
    * sentinel code. */
  def encode(vectors: DataFrame, cb: Seq[(Int, Long, Seq[Long])]): DataFrame = {
    require(cb.nonEmpty, "encode needs a non-empty codebook")
    require(cb == cb.sortBy(t => (t._1, t._2)),
      "codebook literal must be sorted by (sub_id, code_id) (tie-break contract)")
    val bySub: Seq[Seq[(Long, Seq[Long], Long)]] =
      (0 until PqM).map(j => cb.collect {
        case (sj, cid, cv) if sj == j => (cid, cv, cv.map(x => x * x).sum)
      })
    require(bySub.forall(_.nonEmpty),
      s"codebook must cover all $PqM subspaces")
    val cbArr: Column = typedLit(bySub)
    val codes = transform(sequence(lit(0), lit(PqM - 1)), j => {
      val sv = slice(col("v"), j * lit(PqSubDim) + lit(1), lit(PqSubDim))
      aggregate(
        element_at(cbArr, (j + lit(1)).cast("int")),
        struct(lit(-1L).as("c"), lit(Long.MaxValue).as("d")),
        (acc, x) => {
          // dist'(code) = |cv|^2 - 2 sv·cv  (|sv|^2 dropped, same ordering)
          val d = x.getField("_3") - lit(2L) * dot_i64(sv, x.getField("_2"))
          when(d < acc.getField("d"),
            struct(x.getField("_1").as("c"), d.as("d"))).otherwise(acc)
        },
        acc => acc.getField("c"))
    })
    vectors.withColumn("codes",
      when(array_contains(codes, -1L), raise_error(concat(
        lit("StreamPqEncode: un-encodable vector (dimension mismatch " +
          "or null element), vec_id="), col("vec_id").cast("string"))))
        .otherwise(codes))
  }

  /** Replay a finite embeddings directory through the encoder and
    * collect (vec_id, codes). */
  def runToCompletion(spark: SparkSession, dir: String,
      cb: Seq[(Int, Long, Seq[Long])], queryName: String): DataFrame = {
    val quantized = StreamAnnAssign.readVectors(spark, dir)
      .select(col("vec_id"), expr(graft.queries.Extensions.QV).as("v"))
    val q = encode(quantized, cb)
      .select(col("vec_id"), col("codes"))
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

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg

/** Streaming heavy hitters — the ingest-time twin of batch q153.
  *
  * Each micro-batch is reduced to its own Misra-Gries summary (a
  * ≤ capacity counter map — the SAME [[MisraGriesAgg]] kernel the batch
  * operator runs, so batch and stream can never disagree on the
  * sketch's semantics) and merged into ONE running summary on the
  * driver. That summary is the ENTIRE streaming state: capacity
  * counters + the exact item total n, metadata-sized forever, no state
  * store, no corpus-keyed shuffle — each batch's aggregate is
  * partial-combined per partition before the driver sees it.
  *
  * What streaming can and cannot promise (declared, spec-pinned): the
  * batch operator's exact verification pass needs a second corpus scan,
  * which a stream cannot replay; instead the stream emits the
  * GUARANTEE-BOUNDED set {w : est(w)·(capacity+1) > n}. Because MG
  * never overcounts (est ≤ true count), every emitted token truly
  * exceeds n/(capacity+1) — ZERO false positives at the detection
  * threshold — and because undercount is ≤ n/(capacity+1) under any
  * merge tree (mergeable-summaries rule, PropertySpec), every token
  * above 2n/(capacity+1) is guaranteed emitted. Tokens between the two
  * bounds may ride either way; the batch q153 pass is the exact
  * arbiter. StreamingSpec pins all three containments against exact
  * counts and batch q153.
  */
object StreamHeavyHitters {

  /** The running mergeable summary (driver-held; the trained-artifact
    * posture of StreamAnnAssign's centroids, except this one FOLDS). */
  final class State(val capacity: Int) {
    private val agg = new MisraGriesAgg(capacity)
    @volatile private var st: (Map[String, Long], Long) = agg.zero

    /** Absorb one (finite) batch frame of (doc_id, text) rows. */
    def absorb(batch: DataFrame): Unit = {
      val s = batch.sparkSession
      import s.implicits._
      val summary = batch
        .select(explode(split(col("text"), " ")).as("w")).as[String]
        .select(agg.toColumn).head()
      st = agg.merge(st, summary)
    }

    def n: Long = st._2
    def summary: Map[String, Long] = st._1

    /** The zero-false-positive emitted set: (token, min true count),
      * count-descending, token tie-break (q153's presentation order). */
    def confirmed: Seq[(String, Long)] =
      st._1.toSeq
        .filter { case (_, est) => est * (capacity + 1) > st._2 }
        .sortBy { case (w, est) => (-est, w) }
  }

  /** Replay a finite stream of document batches into a fresh [[State]]
    * (foreachBatch: the per-batch aggregate runs as a normal batch job,
    * partial-combined; only the ≤ capacity summary reaches the driver). */
  def runToCompletion(spark: SparkSession, path: String,
      capacity: Int): State = {
    val state = new State(capacity)
    val docs = spark.readStream
      .schema(StreamDedup.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(path)
    val q = docs.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) => state.absorb(batch) }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    state
  }
}

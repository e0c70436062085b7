package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{DeltaReader, DeltaWriter}

/** Streaming SCD TYPE-2 maintenance — change batches arriving as a
  * stream keep a versioned dimension current ([[DeltaWriter.scd2Apply]]
  * per micro-batch), the streaming half of the q177/q178 story: an
  * upstream CDC or snapshot feed lands here, and every fact pipeline
  * point-in-time-joins against the resulting history.
  *
  * Delivery semantics: EXACTLY-ONCE — and unlike
  * [[StreamDeltaIngest]]'s append sink, NO txn ledger is needed. The
  * verb is naturally idempotent: a redelivered batch (foreachBatch's
  * at-least-once crash window) re-presents attribute tuples that now
  * EQUAL the current versions, so scd2Apply finds no changed and no
  * new keys and publishes nothing. The batch stamp is a pure function
  * of the batchId (`stampOf`, default identity — monotone because
  * batchIds are), so even the stamp re-derives identically on
  * redelivery.
  *
  * Batch contract = the verb's: full attribute tuples per key, no
  * duplicate keys within one batch (a multi-row-per-key CDC feed
  * reduces to last-per-key upstream first). */
object StreamScd2Ingest {

  /** Apply each non-empty micro-batch as one SCD2 change batch at
    * stamp `stampOf(batchId)`. Runs the finite source to completion
    * and returns the number of commits actually published (no-op
    * batches — including redeliveries — publish none). */
  def runToCompletion(spark: SparkSession, source: DataFrame,
      tablePath: String, keys: Seq[String],
      stampOf: Long => Long = identity,
      checkpointLocation: Option[String] = None): Long = {
    var commits = 0L
    val writer = source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val before =
            if (DeltaWriter.tableExists(tablePath))
              DeltaReader.snapshot(spark, tablePath).version
            else -1L
          val v = DeltaWriter.scd2Apply(batch, tablePath, keys,
            stampOf(batchId))
          if (v > before) commits += 1
        }
      }
    val q = checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
    try q.processAllAvailable()
    finally q.stop()
    commits
  }
}

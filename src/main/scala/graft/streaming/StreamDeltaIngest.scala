package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.DeltaWriter

/** Streaming ingest INTO the engine's own Delta writer — the sink that
  * closes the loop: the same library that scans, maintains, and
  * CDC-reads Delta tables can now LAND a stream in one, so a curation
  * pipeline's streaming stages (dedup → score → route) terminate in a
  * table every Delta reader — including this engine's — can scan with
  * partition pruning and stats-based skipping.
  *
  * Shape: `foreachBatch` + [[DeltaWriter.append]]. Each non-empty
  * micro-batch becomes ONE atomic versioned commit (readers never see a
  * partial batch); per-file stats are computed by the writer's one-pass
  * aggregate, so files landed by the stream skip-prune exactly like
  * batch-written ones; the downstream incremental consumer is
  * `DeltaReader.loadChanges` over the committed version range — commit
  * versions ARE the exactly-once ledger. Delivery semantics: Structured
  * Streaming's foreachBatch is at-least-once on retry after a crash
  * BETWEEN commit and checkpoint; production pairs the batchId with a
  * txn-app-id action to make redelivery idempotent (the delta spec's
  * `txn` action — a one-line extension of the writer's commit header,
  * declared out of scope here and pinned as the caveat in SCALE.md).
  */
object StreamDeltaIngest {

  /** Attach the Delta sink to a streaming frame: every micro-batch
    * appends one commit to `tablePath` (empty batches are skipped — no
    * empty commits). Returns the started query's awaitable handle via
    * the caller's own writeStream — here we run to completion over a
    * finite source and return the committed version count. */
  def runToCompletion(spark: SparkSession, source: DataFrame,
      tablePath: String, partitionBy: Seq[String] = Nil): Long = {
    var commits = 0L
    val q = source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          DeltaWriter.append(batch, tablePath, partitionBy)
          commits += 1
        }
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    commits
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.BatchFrameBridge

/** STREAMING materialized-view maintenance — the round's CDF streaming
  * source composed with [[graft.operators.IncrementalAgg]]'s signed
  * fold: a grouped COUNT/SUM materialization of a Delta base table is
  * kept fresh CONTINUOUSLY by a `readStream(readChangeFeed=true) →
  * foreachBatch(fold)` pipeline, following inserts, deletes, updates
  * (copy-on-write or deletion vectors) and ignoring layout maintenance
  * — without ever re-scanning the base after bootstrap.
  *
  * Exactly-once without a txn ledger, from three facts composing:
  *  1. the source's offsets are COMMIT VERSIONS, so every micro-batch
  *     is an exact, non-overlapping commit window whose events carry
  *     `_commit_version`;
  *  2. the materialization is SELF-DESCRIBING — the `graft.ivm.upto`
  *     table property (and the legacy `__upto` column) records the
  *     highest base version folded in, published ATOMICALLY with the
  *     rows in one overwrite commit, so the watermark survives even an
  *     all-groups-retracted 0-row state;
  *  3. a batch redelivered after a crash between fold and offset
  *     checkpoint replays the SAME window — the watermark is at or
  *     past its top version and the fold no-ops.
  *
  * Cost per trigger: the window's events (grouped map-side) + a
  * full-outer join against the group-count-sized materialization —
  * never the base. The batch twin (poll-driven, snapshot bootstrap
  * immune to log cleanup) is `IncrementalAgg.refresh`; this is the
  * push-driven spelling for bases written continuously. */
object StreamIvm {

  /** Drive the finite base's change feed to completion, folding every
    * micro-batch into the materialization at `mvPath`; returns the
    * base version the materialization now reflects. Resumable via
    * `checkpointLocation`: a restart continues from the recorded
    * offsets and redelivered windows no-op against the watermark. */
  def runToCompletion(spark: SparkSession, basePath: String,
      mvPath: String, keyCol: String, valueExpr: String,
      checkpointLocation: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): Long = {
    val reader = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .load(basePath)
    val writer = src.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        foldBatch(BatchFrameBridge.rewrap(batch), mvPath, keyCol, valueExpr)
        ()
    }
    val q = checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.operators.IncrementalAgg.watermark(spark, mvPath).getOrElse(-1L)
  }

  /** The MIN/MAX twin of [[runToCompletion]]: keeps a
    * `(key, n, mn, mx)` extremum materialization exact through the
    * same CDF pipeline. Extremum retractions are not derivable from
    * scalar state, so each fold may take a TARGETED rescan — a
    * key-semi-joined aggregate over the base snapshot AT the window's
    * top version (an immutable read: redelivered windows rescan
    * bit-identically, so the watermark no-op still carries
    * exactly-once). Untouched groups never re-scan; per-trigger cost =
    * the window's events + the mv-sized join + the touched groups'
    * files (stats/partition pruning bound the rescan). */
  def runToCompletionMinMax(spark: SparkSession, basePath: String,
      mvPath: String, keyCol: String, valueExpr: String,
      checkpointLocation: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): Long = {
    val reader = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .load(basePath)
    val writer = src.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        foldBatchMinMax(BatchFrameBridge.rewrap(batch), basePath, mvPath,
          keyCol, valueExpr)
        ()
    }
    val q = checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.operators.IncrementalAgg.watermark(spark, mvPath).getOrElse(-1L)
  }

  /** [[runToCompletionMinMax]] with per-group VALUE SKETCHES
    * ([[graft.operators.IncrementalAgg.refreshMinMaxSketched]]'s
    * streaming twin): on extremum-heavy churn the typical trigger pops
    * sketches instead of touching the base at all — rescans fire only
    * on per-window sketch exhaustion, so a stream of extremum deletes
    * costs window events + the mv join per trigger, not a base read. */
  def runToCompletionMinMaxSketched(spark: SparkSession, basePath: String,
      mvPath: String, keyCol: String, valueExpr: String,
      checkpointLocation: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None, k: Int = 8): Long = {
    val reader = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
    val src = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .load(basePath)
    val writer = src.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        val cached = BatchFrameBridge.rewrap(batch).cache()
        try {
          if (!cached.isEmpty) {
            val upto = cached.select(max(col("_commit_version")))
              .head().getLong(0)
            graft.operators.IncrementalAgg.foldEventsMinMaxSketched(
              cached, basePath, mvPath, keyCol, valueExpr, upto, k)
          }
        } finally {
          cached.unpersist()
          ()
        }
        ()
    }
    val q = checkpointLocation
      .fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.operators.IncrementalAgg.watermark(spark, mvPath).getOrElse(-1L)
  }

  /** Fold one exact commit-window of signed CDF events into the
    * materialization — [[graft.operators.IncrementalAgg.foldEvents]]
    * with the batch frame CACHED first: the window plan (snapshot
    * seeding + per-commit scans + DV diffs) executes once, not once
    * per action (emptiness probe, top-version read, fold aggregate).
    * Idempotent by the watermark guard — the redelivery no-op of the
    * exactly-once argument above. */
  private[graft] def foldBatch(events: DataFrame, mvPath: String,
      keyCol: String, valueExpr: String): Long = {
    val cached = events.cache()
    try {
      if (cached.isEmpty)
        graft.operators.IncrementalAgg
          .watermark(cached.sparkSession, mvPath).getOrElse(-1L)
      else {
        val upto = cached.select(max(col("_commit_version")))
          .head().getLong(0)
        graft.operators.IncrementalAgg
          .foldEvents(cached, mvPath, keyCol, valueExpr, upto)
      }
    } finally {
      cached.unpersist()
      ()
    }
  }

  /** [[foldBatch]]'s MIN/MAX twin —
    * [[graft.operators.IncrementalAgg.foldEventsMinMax]] under the
    * same cache + emptiness-probe discipline. */
  private[graft] def foldBatchMinMax(events: DataFrame, basePath: String,
      mvPath: String, keyCol: String, valueExpr: String): Long = {
    val cached = events.cache()
    try {
      if (cached.isEmpty)
        graft.operators.IncrementalAgg
          .watermark(cached.sparkSession, mvPath).getOrElse(-1L)
      else {
        val upto = cached.select(max(col("_commit_version")))
          .head().getLong(0)
        graft.operators.IncrementalAgg
          .foldEventsMinMax(cached, basePath, mvPath, keyCol, valueExpr, upto)
      }
    } finally {
      cached.unpersist()
      ()
    }
  }
}

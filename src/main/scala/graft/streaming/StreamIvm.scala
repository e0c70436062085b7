package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.BatchFrameBridge

import graft.sources.{DeltaReader, DeltaWriter}

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
  *  2. the materialization is SELF-DESCRIBING (`__upto` = the highest
  *     base version folded in, [[graft.operators.IncrementalAgg]]'s
  *     contract) and each fold publishes rows + new `__upto` in ONE
  *     atomic overwrite commit;
  *  3. a batch redelivered after a crash between fold and offset
  *     checkpoint replays the SAME window — `__upto ≥` its top version
  *     and the fold no-ops.
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
    * offsets and redelivered windows no-op against `__upto`. */
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
    DeltaReader.load(spark, mvPath)
      .select(max(col("__upto"))).head().getLong(0)
  }

  /** Fold one exact commit-window of signed CDF events into the
    * materialization. Idempotent by the `__upto` guard — the
    * redelivery no-op of the exactly-once argument above. */
  private[graft] def foldBatch(events: DataFrame, mvPath: String,
      keyCol: String, valueExpr: String): Long = {
    if (events.isEmpty)
      return currentUpto(events.sparkSession, mvPath).getOrElse(-1L)
    val upto = events.select(max(col("_commit_version"))).head().getLong(0)
    val spark = events.sparkSession
    val prior: Option[DataFrame] =
      try Some(DeltaReader.load(spark, mvPath)) catch { case _: Exception => None }
    val last = prior.map(_.select(max(col("__upto"))).head().getLong(0))
      .getOrElse(-1L)
    if (last >= upto) return last // redelivered window: no-op
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = events
      .groupBy(col(keyCol).as("key"))
      .agg(sum(sign).as("n"), sum(sign * expr(valueExpr)).as("total"))
    val merged = prior match {
      case None => delta
      case Some(mv) =>
        mv.select(col("key"), col("n"), col("total")).as("m")
          .join(delta.as("d"), col("m.key") === col("d.key"), "full_outer")
          .select(
            coalesce(col("m.key"), col("d.key")).as("key"),
            (coalesce(col("m.n"), lit(0L)) +
              coalesce(col("d.n"), lit(0L))).as("n"),
            (coalesce(col("m.total"), lit(0L)) +
              coalesce(col("d.total"), lit(0L))).as("total"))
    }
    DeltaWriter.overwrite(
      merged.filter(col("n") =!= 0L)
        .withColumn("__upto", lit(upto)), mvPath)
    upto
  }

  private def currentUpto(spark: SparkSession, mvPath: String): Option[Long] =
    try Some(DeltaReader.load(spark, mvPath)
      .select(max(col("__upto"))).head().getLong(0))
    catch { case _: Exception => None }
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** The DSv1 streaming `Sink.addBatch` hands over a DataFrame whose
  * plan is the CURRENT micro-batch (source replaced by batch data) —
  * re-planning it per action re-executes the batch's physical plan
  * each time. Spark's own ForeachBatchSink re-roots the frame on the
  * already-planned InternalRow RDD via `LogicalRDD.fromDataset` before
  * handing it to user code; `Dataset.ofRows` is private[sql], so graft
  * bridges the identical wrap from inside the package. Only used by
  * graft.sources.GraftDeltaSource's streaming sink. */
object BatchFrameBridge {
  def rewrap(data: DataFrame): DataFrame = {
    val classic = data.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val node = LogicalRDD.fromDataset(classic.queryExecution.toRdd, classic,
      isStreaming = false)
    ClassicDataset.ofRows(classic.sparkSession, node)
  }
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** The DSv1 streaming `Source.getBatch` contract wants a DataFrame
  * whose logical plan is MARKED STREAMING (`MicroBatchExecution`
  * substitutes it for the `StreamingExecutionRelation` leaf and
  * re-aliases positionally) — Spark's own V1 sources build theirs via
  * `internalCreateDataFrame(rdd, schema, isStreaming = true)`, which is
  * private[sql]. graft's delta streaming source plans each micro-batch
  * as a NORMAL batch frame (the same `DeltaReader.loadChanges` plan the
  * batch CDC consumer runs) and re-roots it here on its planned
  * InternalRow RDD with the streaming bit set — the twin of
  * [[BatchFrameBridge.rewrap]] on the sink side. */
object StreamFrameBridge {
  def asStreamingBatch(data: DataFrame): DataFrame = {
    val classic = data.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val node = LogicalRDD.fromDataset(classic.queryExecution.toRdd, classic,
      isStreaming = true)
    ClassicDataset.ofRows(classic.sparkSession, node)
  }
}

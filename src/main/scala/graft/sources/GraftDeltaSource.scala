package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.DataSourceUtils
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.graftbridge.BatchFrameBridge
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.streaming.DeltaStreamSource

/** `df.write.format("graft-delta")` — the standard DataFrameWriter
  * entry into [[DeltaWriter]], so landing a Delta table needs no
  * library import: `df.write.format("graft-delta").partitionBy(…)
  * .mode(…).save(path)` commits through the exact same staged-move +
  * atomic-log-publish protocol as the library calls (the reference's
  * users register tables by DDL and write through their engine's
  * native verbs; this is the Spark-native spelling of the same).
  *
  * Deliberately the DataSource V1 `CreatableRelationProvider` hook,
  * not a V2 `TableProvider` write chain: the commit protocol is
  * driver-orchestrated (stage the whole DataFrame, move files, publish
  * ONE atomic log version with per-file stats computed by a follow-up
  * distributed pass) and V1 hands the provider the whole DataFrame —
  * exactly that shape. A V2 `BatchWrite` would force the commit through
  * per-task `WriterCommitMessage`s, duplicating the staging logic the
  * writer already owns while adding nothing: the data write itself IS
  * distributed either way (DeltaWriter stages via a normal parquet
  * write job). Modes map to the writer's verbs:
  *
  *  - `append`        → [[DeltaWriter.append]] (creates the table at
  *                      version 0 when absent — Delta's own convention);
  *  - `overwrite`     → [[DeltaWriter.overwrite]] (ONE atomic commit:
  *                      removes every live file, adds the replacement);
  *  - `errorifexists` → refuse when a table already exists, else create;
  *  - `ignore`        → no-op when a table already exists, else create.
  *
  * `partitionBy` columns arrive through the V1 options side-channel
  * (`__partition_columns`, JSON-encoded by DataFrameWriter) and are
  * decoded with Spark's own codec. READING stays on
  * [[DeltaReader.load]] / the DDL shim: the read path layers deletion
  * vectors and column mapping ON TOP of its snapshot-backed
  * `HadoopFsRelation`, semantics a plain V1 `BaseRelation` cannot
  * carry — a format-based read would silently resurrect DV-deleted
  * rows, so none is offered. */
class GraftDeltaSource extends CreatableRelationProvider
    with StreamSinkProvider with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  private def pathOf(parameters: Map[String, String], verb: String): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      s"graft-delta: a table path is required — $verb"))

  /** `spark.readStream.format("graft-delta").load(path)` — the Delta
    * STREAMING SOURCE ([[DeltaStreamSource]]): offsets are commit
    * versions, batches are exact log windows planned through
    * [[DeltaReader.loadChanges]], maintenance commits are transparent
    * and change commits refuse (or skip, `skipChangeCommits=true`).
    * The schema is always the table's own logical snapshot schema —
    * a user-declared schema cannot widen what the log defines. */
  override def sourceSchema(ctx: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = pathOf(parameters,
      "spark.readStream.format(\"graft-delta\").load(path)")
    val base = DeltaReader.snapshot(ctx.sparkSession, path).schema
    val out =
      if (!parameters.get("readChangeFeed").exists(_.toBoolean)) base
      else StructType(base.fields.toIndexedSeq :+
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false) :+
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false))
    (s"${shortName()}[$path]", out)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = pathOf(parameters,
      "spark.readStream.format(\"graft-delta\").load(path)")
    new DeltaStreamSource(ctx.sparkSession, path, metadataPath,
      parameters.getOrElse("startingVersion", "earliest"),
      parameters.get("maxFilesPerTrigger").map(_.toInt),
      parameters.get("skipChangeCommits").exists(_.toBoolean),
      parameters.get("readChangeFeed").exists(_.toBoolean),
      parameters.get("startingTimestamp"),
      parameters.get("maxBytesPerTrigger").map(parseBytes),
      // bounded catch-up (Trigger.AvailableNow semantics as an option):
      // drain exactly the commits present at query start, then report
      // caught-up; each restart re-pins its own ceiling
      parameters.get("stopAtLatest").orElse(parameters.get("availableNow"))
        .exists(_.toBoolean))
  }

  /** `maxBytesPerTrigger` spellings: a plain byte count or a k/m/g
    * binary-suffixed one (`"10k"` = 10240). */
  private[sources] def parseBytes(s: String): Long = {
    // the WHOLE string is validated up front so '10kb' / '1 m' / '10x'
    // all get the descriptive error (a suffix-only check let '10kb'
    // fall through to '10k'.toLong and die with a raw
    // NumberFormatException), and the multiplication is overflow-checked
    // — an absurd input must refuse, not wrap to a negative budget
    val Spelled = "(\\d+)\\s*([kmg]?b?)".r
    s.trim.toLowerCase match {
      case Spelled(num, suffix) =>
        val mult = suffix.stripSuffix("b") match {
          case "" => 1L
          case "k" => 1L << 10
          case "m" => 1L << 20
          case "g" => 1L << 30
        }
        val v =
          try Math.multiplyExact(num.toLong, mult)
          catch {
            case _: ArithmeticException | _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft-delta stream: maxBytesPerTrigger overflows a " +
                  s"64-bit byte count: '$s'")
          }
        require(v > 0, s"graft-delta stream: maxBytesPerTrigger must be " +
          s"positive, got '$s'")
        v
      case _ => throw new IllegalArgumentException(
        s"graft-delta stream: maxBytesPerTrigger must be a positive byte " +
          s"count (optionally k/m/g/kb/mb/gb-suffixed), got '$s'")
    }
  }

  /** `df.writeStream.format("graft-delta").option("path", …).start()`
    * — the declarative spelling of [[graft.streaming.StreamDeltaIngest]]:
    * every non-empty micro-batch is ONE atomic txn-stamped commit
    * ([[DeltaWriter.appendOnce]] keyed (appId, batchId)), so a batch
    * redelivered across a crash-recovery restart no-ops against the
    * table's own ledger — exactly-once without the user writing a
    * foreachBatch body. Append output mode only (a Delta append sink
    * has no notion of update/complete retraction). `appId` option
    * overrides the ledger key (default derives from the table path);
    * `partitionBy` flows through the streaming API's partitioning
    * hook. The batch frame is re-rooted on its already-planned RDD
    * (the ForeachBatchSink wrap, [[BatchFrameBridge]]) so the
    * emptiness probe and the staging write don't re-execute the
    * micro-batch plan. */
  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta: a table path is required — " +
        "df.writeStream.format(\"graft-delta\").option(\"path\", …)"))
    require(outputMode == OutputMode.Append(),
      s"graft-delta sink supports Append output mode only, got $outputMode")
    val appId = parameters.getOrElse("appId", s"graft-delta-sink:$path")
    new Sink {
      override def name(): String = s"graft-delta[$path]"
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val batch = BatchFrameBridge.rewrap(data)
        if (!batch.isEmpty)
          DeltaWriter.appendOnce(batch, path, partitionColumns,
            appId, batchId)
      }
    }
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta: a table path is required — df.write.format(\"graft-delta\").save(path)"))
    val partitionBy = parameters.get(DataSourceUtils.PARTITIONING_COLUMNS_KEY)
      .map(DataSourceUtils.decodePartitioningColumns)
      .getOrElse(Seq.empty)
    val exists = DeltaWriter.tableExists(path)
    mode match {
      case SaveMode.Append =>
        DeltaWriter.append(data, path, partitionBy)
      case SaveMode.Overwrite =>
        DeltaWriter.overwrite(data, path, partitionBy)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-delta: a Delta table already exists at $path " +
            "(mode ErrorIfExists); use mode append/overwrite")
        else DeltaWriter.append(data, path, partitionBy)
      case SaveMode.Ignore =>
        if (!exists) DeltaWriter.append(data, path, partitionBy)
    }
    // V1 contract wants a relation back; writes are terminal here, so a
    // schema-only carrier is the whole answer (reads go through
    // DeltaReader — see the class doc)
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }
}

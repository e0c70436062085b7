package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg
import graft.sources.{DeltaReader, DeltaWriter}

/** IVM: after every base commit, an incremental refresh (which reads
  * ONLY that commit's rows through loadChanges) must equal the full
  * recompute over the whole base — and a refresh with nothing new must
  * be a no-op that publishes no commit. */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  private def tmp(name: String): String = {
    val f = new File(sys.props("java.io.tmpdir"), s"graft_ivm_$name")
    def del(x: File): Unit = {
      if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(del)
      x.delete()
    }
    del(f)
    f.getAbsolutePath
  }

  private def fullAgg(base: String): Map[String, (Long, Long)] =
    DeltaReader.load(spark, base)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)), sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def mvRows(mv: String): Map[String, (Long, Long)] =
    DeltaReader.load(spark, mv)
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("total")))).toMap

  test("composes with streaming ingest: stream → base, refresh → mv == batch agg") {
    val base = tmp("stream_base"); val mv = tmp("stream_mv")
    val source = spark.readStream
      .schema(graft.streaming.StreamDedup.schema)
      .option("pathGlobFilter", "documents.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(d)
    graft.streaming.StreamDeltaIngest.runToCompletion(spark, source, base)
    IncrementalAgg.refresh(spark, base, mv, "lang", "1L")
    val got = DeltaReader.load(spark, mv)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("n")).toMap
    val want = Tables.t(spark, d, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("incremental refresh equals full recompute after every base commit") {
    val base = tmp("base"); val mv = tmp("mv")
    val orders = Tables.t(spark, d, "orders")

    DeltaWriter.append(orders.filter(col("o_orderkey") % 2 === 0), base)
    assert(IncrementalAgg.refresh(spark, base, mv, "o_orderpriority",
      "CAST(round(o_totalprice * 100) AS BIGINT)") == 0L)
    assert(mvRows(mv) == fullAgg(base))

    DeltaWriter.append(orders.filter(col("o_orderkey") % 2 =!= 0), base)
    assert(IncrementalAgg.refresh(spark, base, mv, "o_orderpriority",
      "CAST(round(o_totalprice * 100) AS BIGINT)") == 1L)
    assert(mvRows(mv) == fullAgg(base))

    // nothing new: no-op, no commit published
    val before = new File(mv, "_delta_log").listFiles().map(_.getName).toSet
    assert(IncrementalAgg.refresh(spark, base, mv, "o_orderpriority",
      "CAST(round(o_totalprice * 100) AS BIGINT)") == 1L)
    assert(new File(mv, "_delta_log").listFiles().map(_.getName).toSet == before)
  }
}

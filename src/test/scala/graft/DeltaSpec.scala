package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeletionVectors, DeltaReader, Fixtures, Z85}

/** Delta reader semantics, including the reference's only test vectors —
  * the DV selection cases in
  * /root/reference/crates/providers/src/deltatable.rs:585-618. */
class DeltaSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("Z85 round-trips arbitrary 4-aligned bytes") {
    val data = Array.tabulate(64)(i => (i * 37 + 11).toByte)
    assert(Z85.decode(Z85.encode(data)).toSeq == data.toSeq)
  }

  test("roaring bitmap array round-trips row indexes") {
    val rows = Seq(0L, 1L, 3L, 65535L, 65536L, 100000L)
    val ser = DeletionVectors.serializeRoaringArray(rows)
    assert(DeletionVectors.parseRoaringArray(ser).toSet == rows.toSet)
  }

  // deltatable.rs:585-618 — selection-vector semantics. A selection
  // vector [t,t,t,f,t] means row 3 is deleted: our DV equivalent is a
  // bitmap containing exactly the deleted indexes.
  test("reference DV vectors: all-selected, none-selected, mixed") {
    // all selected → empty DV → every row survives
    assert(DeletionVectors.parseRoaringArray(
      DeletionVectors.serializeRoaringArray(Seq.empty)).isEmpty)
    // none selected → DV holds all indexes
    val none = DeletionVectors.serializeRoaringArray(Seq(0L, 1L, 2L))
    assert(DeletionVectors.parseRoaringArray(none).toSet == Set(0L, 1L, 2L))
    // mixed [t,t,t,f,t] → deleted = {3}; survivors = {0,1,2,4}
    val mixed = DeletionVectors.parseRoaringArray(
      DeletionVectors.serializeRoaringArray(Seq(3L))).toSet
    val survivors = (0L to 4L).filterNot(mixed)
    assert(survivors == Seq(0L, 1L, 2L, 4L))
  }

  test("snapshot replay applies removes and later-add-wins") {
    val dir = Fixtures.deltaNation(spark, d)
    val snap = DeltaReader.snapshot(spark, dir)
    assert(snap.files.map(_.path).toSet ==
      Set("part-a.parquet", "part-c.parquet"))
    assert(snap.partitionColumns.isEmpty)
    assert(snap.schema.fieldNames.toSeq ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("partitioned snapshot splits partition values out of file schema") {
    val dir = Fixtures.deltaNationPartitioned(spark, d)
    val snap = DeltaReader.snapshot(spark, dir)
    assert(snap.partitionColumns == Seq("n_regionkey"))
    assert(snap.files.forall(_.partitionValues.contains("n_regionkey")))
    val df = DeltaReader.load(spark, dir)
    // partition column typed per schema and appended last
    assert(df.schema.fieldNames.last == "n_regionkey")
    assert(df.schema("n_regionkey").dataType.typeName == "integer")
    assert(df.count() == 25)
  }

  test("partition filter statically prunes scan branches") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = Fixtures.deltaNationPartitioned(spark, d)
    val df = DeltaReader.load(spark, dir)
      .filter(org.apache.spark.sql.functions.col("n_regionkey") === 3)
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.length == 1, s"expected 1 surviving scan, got ${scans.length}")
    assert(df.count() == 5)
  }

  test("DV table drops exactly the deleted row indexes (all 3 storage types)") {
    val dir = Fixtures.deltaNationDv(spark, d)
    val keys = DeltaReader.load(spark, dir)
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    assert(keys == (0 to 24).toSet -- Set(1, 3, 9, 19))
  }

  test("time travel: snapshotAt(0) sees the pre-remove file set") {
    val dir = Fixtures.deltaNation(spark, d)
    val v0 = DeltaReader.snapshotAt(spark, dir, 0L)
    assert(v0.files.map(_.path).toSet ==
      Set("part-a.parquet", "part-b.parquet"))
    val v1 = DeltaReader.snapshotAt(spark, dir, 1L)
    assert(v1.files.map(_.path).toSet ==
      Set("part-a.parquet", "part-c.parquet"))
  }

  test("column mapping mode is rejected with a clear error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cm").toFile
    val log = new java.io.File(dir, "_delta_log"); log.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(log, "0" * 20 + ".json").toPath,
      """{"metaData":{"id":"x","schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""")
    val e = intercept[IllegalArgumentException] {
      DeltaReader.snapshot(spark, dir.getAbsolutePath)
    }
    assert(e.getMessage.contains("column mapping"))
  }

  test("checkpointed table stitches checkpoint + json tail") {
    val dir = Fixtures.deltaNationCheckpoint(spark, d)
    assert(DeltaReader.load(spark, dir).count() == 25)
  }
}

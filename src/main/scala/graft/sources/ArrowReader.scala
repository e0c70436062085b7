package graft.sources

import java.io.File
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Paths, StandardOpenOption}
import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC *file* format reader (parity with the reference's Arrow
  * factory, /root/reference/crates/core/src/context.rs:42), built on the
  * arrow-vector classes that ship inside Spark's own jars — no new
  * dependency.
  *
  * Scale design: the IPC file footer indexes every record batch, so the
  * unit of parallelism is (file, batchIndex) — the driver reads only
  * footers (schema + batch counts), executors each random-access ONE
  * batch via `loadRecordBatch`. A directory of arrow files distributes
  * exactly like a multi-file parquet scan; a single huge file still
  * parallelizes across its batches.
  */
object ArrowReader {

  /** Load a `.arrow` IPC file — or a directory of them — as a DataFrame. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val f = new File(path)
    val files: Seq[File] =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".arrow")).sortBy(_.getName).toSeq
      else Seq(f)
    require(files.nonEmpty && files.forall(_.isFile),
      s"no .arrow files at: $path")

    val schema = withReader(files.head) { r =>
      StructType(r.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
        .map(fld => StructField(fld.getName, sparkType(fld), fld.isNullable)))
    }
    val tasks: Seq[(String, Int)] = files.flatMap { file =>
      withReader(file)(r => (0 until r.getRecordBlocks.size())
        .map(i => (file.getAbsolutePath, i)))
    }
    val sc = spark.sparkContext
    val rows = sc
      .parallelize(tasks, math.max(1, math.min(tasks.size, sc.defaultParallelism)))
      .flatMap { case (p, i) => readBatch(p, i) }
    spark.createDataFrame(rows, schema)
  }

  /** Executor-side: open the file, random-access record batch `i`, and
    * materialize its rows (the Arrow buffers are freed on close, so rows
    * are copied out eagerly — one batch of memory per task). */
  private def readBatch(path: String, i: Int): Seq[Row] = {
    val alloc = new RootAllocator()
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    val r = new ArrowFileReader(ch, alloc)
    try {
      r.loadRecordBatch(r.getRecordBlocks.get(i))
      val root = r.getVectorSchemaRoot
      val vecs = root.getFieldVectors.asScala.toSeq
      (0 until root.getRowCount)
        .map(ri => Row.fromSeq(vecs.map(v => value(v, ri)))).toList
    } finally {
      r.close(); ch.close(); alloc.close()
    }
  }

  private def withReader[T](f: File)(fn: ArrowFileReader => T): T = {
    val alloc = new RootAllocator()
    val ch = FileChannel.open(f.toPath, StandardOpenOption.READ)
    val r = new ArrowFileReader(ch, alloc)
    try fn(r) finally { r.close(); ch.close(); alloc.close() }
  }

  private def sparkType(f: Field): DataType = f.getType match {
    case t: ArrowType.Int if t.getBitWidth == 64 => LongType
    case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
    case t: ArrowType.Int if t.getBitWidth == 16 => ShortType
    case t: ArrowType.FloatingPoint =>
      if (t.getPrecision == FloatingPointPrecision.SINGLE) FloatType
      else DoubleType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Date => DateType
    case other => throw new IllegalArgumentException(
      s"unsupported arrow type for column '${f.getName}': $other")
  }

  private def value(v: ValueVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: IntVector      => x.get(i)
      case x: BigIntVector   => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: Float4Vector   => x.get(i)
      case x: Float8Vector   => x.get(i)
      case x: VarCharVector  => new String(x.get(i), StandardCharsets.UTF_8)
      case x: BitVector      => x.get(i) == 1
      case x: DateDayVector  => java.sql.Date.valueOf(LocalDate.ofEpochDay(x.get(i).toLong))
      case other => throw new IllegalArgumentException(
        s"unsupported arrow vector: ${other.getClass.getSimpleName}")
    }
}

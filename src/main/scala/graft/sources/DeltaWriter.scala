package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Append-mode Delta Lake WRITER — the committing half of
  * [[DeltaReader]] (the reference only reads Delta; writing makes the
  * table-format story round-trip: an ingest pipeline can land curated
  * output as a Delta table that this engine — or any Delta reader —
  * scans with partition pruning and stats-based file skipping).
  *
  * Commit protocol (the delta spec's JSON transaction log):
  *  - data files stage under `.stage-<v>`, then move into the table
  *    root (partition dirs preserved) — Spark part-file names carry a
  *    per-job UUID, so names never collide across commits and a crashed
  *    stage leaves only an orphaned dot-directory no log replay reads;
  *  - `_delta_log/<v padded to 20>.json` is written to a temp file and
  *    atomically renamed — the rename fails if the version exists,
  *    which is the poor man's optimistic-concurrency gate (one winner
  *    per version; a real multi-writer deployment needs a commit
  *    coordinator, declared out of scope);
  *  - version 0 carries protocol + metaData (schemaString = Spark
  *    schema JSON, the same form [[DeltaReader]] parses); later appends
  *    carry adds only and REQUIRE an unchanged schema — schema
  *    evolution is a metaData commit this writer deliberately refuses
  *    to emit implicitly;
  *  - minReaderVersion escalates to 3 + readerFeatures only when the
  *    schema demands it (TimestampNTZ), mirroring
  *    `DeltaReader.applyProtocol`'s supported set.
  *
  * Per-file statistics are computed in ONE distributed pass: the
  * freshly moved files are re-read with `_metadata.file_path` and
  * aggregated per file (numRecords, min/max cast to string, nullCount)
  * — a single map-side-combined aggregate over data that is still hot
  * in the page cache, never a per-file driver loop, so the shape holds
  * at thousands of files per commit. Min/max are emitted as Spark's own
  * cast-to-string forms, which round-trip through `Cast(string → dt)`
  * in the session zone — exactly how [[DeltaStats.mayMatch]] interprets
  * them on the read side; types outside the round-trip-proven set carry
  * no min/max (readers keep such files conservatively).
  */
object DeltaWriter {

  /** Append `df` to the Delta table at `tablePath`, creating it (with
    * protocol + metaData) when no log exists. Returns the committed
    * version. */
  def append(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val table = new File(tablePath)
    val logDir = new File(table, "_delta_log")
    val existing = Option(logDir.listFiles()).getOrElse(Array.empty[File])
      .map(_.getName).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong)
    val version = if (existing.isEmpty) 0L else existing.max + 1

    if (version == 0L) {
      val missing = partitionBy.filterNot(df.schema.fieldNames.contains)
      require(missing.isEmpty,
        s"partition columns $missing absent from schema ${df.schema.fieldNames.toSeq}")
    } else {
      val snap = DeltaReader.snapshot(spark, tablePath)
      require(snap.partitionColumns == partitionBy,
        s"append partitioning $partitionBy != table's ${snap.partitionColumns}")
      val want = snap.schema.fields.map(f => f.name -> f.dataType).toMap
      val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
      require(want == got,
        s"schema mismatch appending to $tablePath (schema evolution needs " +
          s"an explicit metaData commit): table=$want df=$got")
    }

    // ---- stage + move the data files
    val staging = new File(table, s".stage-$version")
    if (staging.exists()) delete(staging)
    val w0 = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0)
      .parquet(staging.getAbsolutePath)
    val moved = collectParquet(staging).map { f =>
      val rel = staging.toPath.relativize(f.toPath).toString
      val dest = new File(table, rel)
      dest.getParentFile.mkdirs()
      Files.move(f.toPath, dest.toPath) // throws on collision, never clobbers
      rel
    }
    delete(staging)

    // ---- one distributed pass: per-file numRecords / min / max / nullCount
    val partSet = partitionBy.toSet
    val dataFields = df.schema.fields.filterNot(f => partSet.contains(f.name))
    val statFields = dataFields.filter(f => statWritable(f.dataType))
    val byName = if (moved.isEmpty) Map.empty[String, org.apache.spark.sql.Row]
    else {
      val src = spark.read
        .schema(StructType(dataFields)) // pinned: no inference pass
        .parquet(moved.map(r => new File(table, r).getAbsolutePath): _*)
        .select(col("_metadata.file_path").as("__path") +:
          dataFields.toIndexedSeq.map(f => col(f.name)): _*)
      val aggs: Seq[org.apache.spark.sql.Column] =
        Seq(count(lit(1)).as("__n")) ++
          statFields.flatMap(f => Seq(
            min(col(f.name)).cast("string").as(s"__min_${f.name}"),
            max(col(f.name)).cast("string").as(s"__max_${f.name}"))) ++
          dataFields.map(f =>
            sum(when(col(f.name).isNull, 1L).otherwise(0L))
              .as(s"__null_${f.name}"))
      src.groupBy(col("__path")).agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => new File(new java.net.URI(r.getString(0)).getPath).getName -> r)
        .toMap
    }

    // ---- compose the commit
    val adds = moved.map { rel =>
      val f = new File(table, rel)
      val segs = rel.replace(File.separatorChar, '/').split('/')
      val pv = segs.dropRight(1).map { seg =>
        val i = seg.indexOf('=')
        require(i > 0, s"unparseable partition dir '$seg' under $rel")
        val raw = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg.drop(i + 1))
        seg.take(i) ->
          (if (raw == "__HIVE_DEFAULT_PARTITION__") None else Some(raw))
      }
      val r = byName(f.getName)
      val minsJ = statFields.flatMap { sf =>
        Option(r.getAs[String](s"__min_${sf.name}"))
          .map(v => s"${jstr(sf.name)}:${jsonVal(sf.dataType, v)}")
      }
      val maxsJ = statFields.flatMap { sf =>
        Option(r.getAs[String](s"__max_${sf.name}"))
          .map(v => s"${jstr(sf.name)}:${jsonVal(sf.dataType, v)}")
      }
      val nullsJ = dataFields.map(sf =>
        s"${jstr(sf.name)}:${r.getAs[Long](s"__null_${sf.name}")}")
      val stats =
        s"""{"numRecords":${r.getAs[Long]("__n")},""" +
          s""""minValues":{${minsJ.mkString(",")}},""" +
          s""""maxValues":{${maxsJ.mkString(",")}},""" +
          s""""nullCount":{${nullsJ.mkString(",")}}}"""
      val pvJ = pv.map {
        case (k, Some(v)) => s"${jstr(k)}:${jstr(v)}"
        case (k, None) => s"${jstr(k)}:null"
      }.mkString("{", ",", "}")
      s"""{"add":{"path":"${segs.mkString("/")}","partitionValues":$pvJ,""" +
        s""""size":${f.length()},"modificationTime":${f.lastModified()},""" +
        s""""dataChange":true,"stats":${jstr(stats)}}}"""
    }
    val header = if (version == 0L) {
      val ntz = df.schema.exists(f => hasNtz(f.dataType))
      val protocol =
        if (ntz)
          """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
            """"readerFeatures":["timestampNtz"],""" +
            """"writerFeatures":["timestampNtz"]}}"""
        else """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      val pc = partitionBy.map(jstr).mkString("[", ",", "]")
      val meta =
        s"""{"metaData":{"id":"${java.util.UUID.randomUUID()}",""" +
          s""""format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${jstr(df.schema.json)},""" +
          s""""partitionColumns":$pc,"configuration":{},"createdTime":0}}"""
      Seq(protocol, meta)
    } else Nil

    // ---- atomic publish: temp file + rename; an existing version wins
    logDir.mkdirs()
    val tmp = new File(logDir, s".tmp-$version-${java.util.UUID.randomUUID()}")
    Files.write(tmp.toPath,
      (header ++ adds).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val target = new File(logDir, f"$version%020d.json")
    try Files.move(tmp.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        tmp.delete()
        throw new IllegalStateException(
          s"concurrent commit lost: version $version already exists", e)
    }
    version
  }

  /** Types whose Spark cast-to-string form PROVABLY round-trips through
    * `Cast(string → dt)` under the session zone — the writer-side
    * counterpart of [[DeltaStats]]'s reader whitelist, minus the ANSI
    * intervals (their string forms are castable only under ANSI parse
    * rules we have not vetted — files simply carry no min/max for such
    * columns and readers keep them conservatively). */
  private def statWritable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | BooleanType |
         DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case st: StringType => st == StringType // binary collation only
    case _ => false
  }

  private def hasNtz(dt: DataType): Boolean = dt match {
    case TimestampNTZType => true
    case s: StructType => s.exists(f => hasNtz(f.dataType))
    case a: ArrayType => hasNtz(a.elementType)
    case m: MapType => hasNtz(m.keyType) || hasNtz(m.valueType)
    case _ => false
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Numeric/boolean stat text goes out as a raw JSON scalar when it is
    * one (NaN/Infinity are not valid JSON numbers — quote them; readers
    * take `asText()` either way); everything else is quoted. */
  private def jsonVal(dt: DataType, text: String): String = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | _: DecimalType
        if text.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?") => text
    case BooleanType if text == "true" || text == "false" => text
    case _ => jstr(text)
  }

  private def collectParquet(f: File): Seq[File] =
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq
        .flatMap(collectParquet)
    else if (f.getName.endsWith(".parquet")) Seq(f)
    else Nil

  private def delete(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(delete)
    f.delete()
  }
}

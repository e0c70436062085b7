package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamNearDup

/** Streaming MinHash-LSH candidates: the Scala kernel must equal q42's
  * Spark-SQL signature spelling bit-for-bit, and the stateful operator
  * must pair arrivals with bucket-mates from EARLIER micro-batches. */
class StreamNearDupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("kernel band signatures match the Spark-SQL spelling exactly") {
    import spark.implicits._
    val texts = Tables.t(spark, d, "documents")
      .filter(size(split($"text", " ")) >= 3)
      .limit(3).select($"text").as[String].collect()
    assert(texts.nonEmpty)
    val P31 = 2147483647L
    for (t <- texts) {
      val sh = Seq(t).toDF("text")
        .select(explode(expr(
          "transform(sequence(1, size(split(text, ' ')) - 2)," +
            " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))")).as("s"))
        .select((conv(substr(md5($"s"), lit(2), lit(15)), 16, 10)
          .cast("long") % lit(P31)).as("h31"))
        .distinct()
      val minAggs = (0 until 16).map(j =>
        min((lit(2L * j + 1) * $"h31" + lit(7919L * j)) % lit(P31)).as(s"mh$j"))
      val row = sh.agg(minAggs.head, minAggs.tail: _*).collect()(0)
      val sparkBands = (0 until 4).map(b =>
        b -> (0 until 4).map(r => row.getLong(b * 4 + r)).mkString(","))
      assert(StreamNearDup.bands(t) == sparkBands)
    }
    // short docs carry no shingles, hence no bands — batch parity
    assert(StreamNearDup.bands("one two").isEmpty)
  }

  test("candidates pair a new arrival with bucket-mates from earlier micro-batches") {
    import spark.implicits._
    val textA = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo"
    val textB = "zero uno dos tres cuatro cinco seis siete ocho nueve " +
      "diez once doce trece catorce quince"
    val textD = "red orange yellow green blue indigo violet cyan magenta " +
      "teal maroon olive navy silver gold bronze"
    val dir = java.nio.file.Files.createTempDirectory("graft_snd").toFile
    Seq((1L, textA, "en"), (2L, textB, "es")).toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "f0").getAbsolutePath)
    // batch 2: doc 3 is an exact copy of doc 1 (all 16 minhashes equal →
    // collides in every band); doc 4 is unrelated
    Seq((3L, textA, "en"), (4L, textD, "en")).toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "f1").getAbsolutePath)
    val merged = new java.io.File(dir, "stream")
    merged.mkdirs()
    Seq("f0", "f1").zipWithIndex.foreach { case (sub, i) =>
      val part = new java.io.File(dir, sub).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(merged, s"part-$i.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val cand = StreamNearDup.runToCompletion(
      spark, merged.getAbsolutePath, "sneardup_test")
    val pairs = cand.select("d1", "d2").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"got $pairs")
    // the exact copy collides in all 4 bands
    assert(cand.filter(col("d1") === 1L && col("d2") === 3L).count() == 4)
    // unrelated docs never surface
    assert(cand.filter(col("d1").isin(2L, 4L) || col("d2").isin(2L, 4L)).count() == 0)
  }

  test("bucket cap bounds pairing WITHIN one micro-batch, not just across batches") {
    import spark.implicits._
    val text = "sierra tango uniform victor whiskey xray yankee zulu " +
      "adam baker charlie dog easy fox george how item jig"
    // one batch of cap+3 identical docs: only the first MaxBucketState
    // ids admitted to the bucket may pair — a hot signature must cost at
    // most cap², never batch²
    val n = StreamNearDup.MaxBucketState + 3
    val dir = java.nio.file.Files.createTempDirectory("graft_sndcap").toFile
    (1 to n).map(i => (i.toLong, text, "en")).toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(dir, "f0").getAbsolutePath)
    val merged = new java.io.File(dir, "stream"); merged.mkdirs()
    val part = new java.io.File(dir, "f0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(merged, "part-0.parquet").toPath)
    val cand = StreamNearDup.runToCompletion(
      spark, merged.getAbsolutePath, "sneardup_cap_test")
    val cap = StreamNearDup.MaxBucketState
    // per band: C(cap, 2) pairs among the admitted ids only
    assert(cand.count() == 4L * cap * (cap - 1) / 2)
    assert(cand.filter(col("d2") > cap.toLong).count() == 0)
  }
}

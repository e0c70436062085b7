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

  /** (doc_id, text, lang) tuple batches → the shared
    * [[StreamFixtures.writeBatches]] micro-batch replay fixture. */
  private def writeBatches(prefix: String,
      batches: Seq[Seq[(Long, String, String)]]): String = {
    import spark.implicits._
    StreamFixtures.writeBatches(prefix,
      batches.map(_.toDF("doc_id", "text", "lang")))
  }

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

  private val tA = "alpha bravo charlie delta echo foxtrot golf hotel india " +
    "juliet kilo lima mike november oscar papa quebec romeo"
  private val tB = "zero uno dos tres cuatro cinco seis siete ocho nueve " +
    "diez once doce trece catorce quince"
  private val tD = "red orange yellow green blue indigo violet cyan magenta " +
    "teal maroon olive navy silver gold bronze"

  test("within-watermark variant matches the unbounded one when all docs are inside the horizon") {
    // doc ids 1..4 → event times 1..4 s apart, far inside the 1 h horizon
    val batches = Seq(
      Seq((1L, tA, "en"), (2L, tB, "es")),
      Seq((3L, tA, "en"), (4L, tD, "en")))
    val unb = StreamNearDup.runToCompletion(
      spark, writeBatches("graft_sndwm_u", batches), "sndwm_unbounded")
    val (wm, _) = StreamNearDup.runWithinWatermark(
      spark, writeBatches("graft_sndwm_w", batches), "sndwm_bounded")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val (u, w) = (rowsOf(unb), rowsOf(wm))
    assert(u.nonEmpty && u == w, s"unbounded=$u bounded=$w")
  }

  test("buckets past the horizon are evicted: no pairs across it, state stays bounded") {
    // batch 1: docs 1 (tA) and 2 (tB) near the epoch-day origin;
    // batch 2: doc 100000 (tD) ~27.8 h later pushes the watermark far past
    //          batch 1's buckets;
    // batch 3: doc 100001 is an exact copy of doc 1 — its band buckets
    //          RECEIVE data (no timeout fires for them), so only the
    //          in-function eviction can stop the stale pairing.
    val batches = Seq(
      Seq((1L, tA, "en"), (2L, tB, "es")),
      Seq((100000L, tD, "en")),
      Seq((100001L, tA, "en")))
    val (cand, stateRows) = StreamNearDup.runWithinWatermark(
      spark, writeBatches("graft_sndwm_x", batches), "sndwm_expire")
    assert(cand.count() == 0,
      s"stale pair leaked: ${cand.collect().mkString(",")}")
    // live buckets = 4 bands of doc 100000 + 4 of doc 100001; docs 1/2's
    // 12 total would remain under NoTimeout
    assert(stateRows == 8L, s"state rows = $stateRows")
  }

  test("late arrivals (event time already past the watermark) never pair") {
    // batch 1: doc 100000 (tA) sets the frontier → watermark lands ~1 h
    //          behind its event time;
    // batch 2: doc 10 is an exact copy arriving LATE (event time far
    //          behind the watermark) next to fresh copy 100001. Without
    //          the symmetric input filter, doc 10 pairs with both; the
    //          declared within-horizon semantics admit only the
    //          (100000, 100001) pair.
    val batches = Seq(
      Seq((100000L, tA, "en")),
      Seq((10L, tA, "en"), (100001L, tA, "en")))
    val (cand, _) = StreamNearDup.runWithinWatermark(
      spark, writeBatches("graft_sndwm_late", batches), "sndwm_late")
    val pairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100000L, 100001L)), s"pairs=$pairs")
  }
}

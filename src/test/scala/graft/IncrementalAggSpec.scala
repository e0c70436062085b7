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

  test("retractions: deletes, DV deletes, updates, and compaction all keep the mv == full recompute") {
    val base = tmp("retract_base"); val mv = tmp("retract_mv")
    val orders = Tables.t(spark, d, "orders")
    val cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    def check(upto: Long): Unit = {
      assert(IncrementalAgg.refresh(spark, base, mv,
        "o_orderpriority", cents) == upto)
      assert(mvRows(mv) == fullAgg(base))
    }

    DeltaWriter.append(orders, base); check(0L)
    // copy-on-write delete retracts exactly the deleted rows' (1, cents)
    DeltaWriter.delete(spark, base, col("o_orderkey") % 10 === 3); check(1L)
    // merge-on-read delete: the DV diff feeds ONLY the newly-dead rows
    DeltaWriter.deleteWithVectors(spark, base,
      col("o_orderkey") % 10 === 4); check(2L)
    // copy-on-write update = retraction + re-insert in one window
    DeltaWriter.update(spark, base, col("o_orderkey") % 10 === 5,
      Map("o_totalprice" -> (col("o_totalprice") * 2))); check(3L)
    // layout maintenance folds in NOTHING (and must not double-count)
    DeltaWriter.compact(spark, base); check(4L)
    // append after all of the above still lands incrementally
    DeltaWriter.append(orders.filter(col("o_orderkey") % 10 === 3), base)
    check(5L)
    // a group retracted to zero vanishes from the materialization,
    // exactly like a full recompute: delete one whole priority class
    DeltaWriter.delete(spark, base, col("o_orderpriority") === "1-URGENT")
    check(6L)
    assert(!mvRows(mv).contains("1-URGENT"))
  }

  test("refreshMinMax: extrema follow retractions; untouched groups skip the rescan") {
    val base = tmp("minmax_base"); val mv = tmp("minmax_mv")
    val nation = Tables.t(spark, d, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_regionkey").cast("long").as("n_regionkey"))
    def full(): Map[Long, (Long, Long, Long)] =
      DeltaReader.load(spark, base)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)), min(col("n_nationkey")), max(col("n_nationkey")))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def mvNow(): Map[Long, (Long, Long, Long)] =
      DeltaReader.load(spark, mv)
        .collect().map(r => r.getAs[Long]("key") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("mn"),
            r.getAs[Long]("mx")))).toMap
    def check(upto: Long): Unit = {
      assert(IncrementalAgg.refreshMinMax(spark, base, mv,
        "n_regionkey", "n_nationkey") == upto)
      assert(mvNow() == full())
    }

    DeltaWriter.append(nation, base); check(0L)
    // insert-only window: bounds merge for free (a larger key appended
    // into one region)
    DeltaWriter.append(spark.createDataFrame(Seq((90L, 0L)))
      .toDF("n_nationkey", "n_regionkey")
      .select(col("n_nationkey").cast(
          nation.schema("n_nationkey").dataType),
        col("n_regionkey").cast(nation.schema("n_regionkey").dataType)),
      base); check(1L)
    // delete STRICTLY INSIDE one group's (mn, mx): no rescan needed,
    // state merge alone must stay exact
    val mid = DeltaReader.load(spark, base)
      .filter(col("n_regionkey") === 0)
      .orderBy(col("n_nationkey")).collect().map(_.getLong(0))
    DeltaWriter.delete(spark, base, col("n_nationkey") === mid(1))
    check(2L)
    // delete AT a group's max (the appended 90): extremum retraction
    // forces the targeted rescan and the next-best value surfaces
    DeltaWriter.delete(spark, base, col("n_nationkey") === 90)
    check(3L)
    // DV delete at a min + update relocating values, then compaction
    val minKey = full()(1L)._2
    DeltaWriter.deleteWithVectors(spark, base,
      col("n_nationkey") === minKey); check(4L)
    DeltaWriter.compact(spark, base); check(5L)
    // a whole group retracted to zero vanishes
    DeltaWriter.delete(spark, base, col("n_regionkey") === 2); check(6L)
    assert(!mvNow().contains(2L))
  }

  test("refreshMinMaxSketched: extremum deletes pop the sketch (zero rescans) where the scalar verb rescans; exhaustion still rescans exactly") {
    val nation = Tables.t(spark, d, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_regionkey").cast("long").as("n_regionkey"))
    def full(base: String): Map[Long, (Long, Long, Long)] =
      DeltaReader.load(spark, base)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)), min(col("n_nationkey")), max(col("n_nationkey")))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def mvNow(mv: String): Map[Long, (Long, Long, Long)] =
      DeltaReader.load(spark, mv)
        .collect().map(r => r.getAs[Long]("key") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("mn"),
            r.getAs[Long]("mx")))).toMap

    // the SAME churn driven through both verbs on twin tables
    val baseA = tmp("mmsk_base_a"); val mvA = tmp("mmsk_mv_a") // scalar
    val baseB = tmp("mmsk_base_b"); val mvB = tmp("mmsk_mv_b") // sketched
    def applyBoth(f: String => Unit): Unit = { f(baseA); f(baseB) }
    def refreshBoth(upto: Long): (Long, Long) = {
      assert(IncrementalAgg.refreshMinMax(spark, baseA, mvA,
        "n_regionkey", "n_nationkey") == upto)
      val scalarRescans = IncrementalAgg.lastRescanGroups
      assert(IncrementalAgg.refreshMinMaxSketched(spark, baseB, mvB,
        "n_regionkey", "n_nationkey", k = 3) == upto)
      val sketchRescans = IncrementalAgg.lastRescanGroups
      assert(mvNow(mvA) == full(baseA))
      assert(mvNow(mvB) == full(baseB))
      (scalarRescans, sketchRescans)
    }

    // PARTITIONED by the group key, so copy-on-write churn stays inside
    // the touched group (an unpartitioned single-file table would churn
    // every group's extrema on any delete — both verbs then rescan/absorb
    // everything, and the contrast this spec exists for disappears)
    applyBoth(b => DeltaWriter.append(nation, b, Seq("n_regionkey")))
    refreshBoth(0L) // bootstrap (no merge ran; counters are stale here)

    // ONE extremum delete per window: the scalar verb must rescan the
    // touched group, the sketch pops its second-best for free
    val maxKey = full(baseA)(1L)._3
    applyBoth(b => DeltaWriter.delete(spark, b,
      col("n_nationkey") === maxKey))
    val (s1, k1) = refreshBoth(1L)
    assert(s1 == 1L, s"scalar verb should rescan the touched group, got $s1")
    assert(k1 == 0L, s"sketch should absorb one extremum delete, got $k1")

    // a second single-extremum delete in a fresh window: still free
    val minKey = full(baseA)(0L)._2
    applyBoth(b => DeltaWriter.deleteWithVectors(spark, b,
      col("n_nationkey") === minKey))
    val (s2, k2) = refreshBoth(2L)
    assert(s2 == 1L && k2 == 0L, s"got scalar=$s2 sketch=$k2")

    // EXHAUSTION: delete more than k=3 values off one group's top end
    // in one window — the sketch must detect it cannot prove the new
    // max and take the targeted rescan (and stay exact)
    val top4 = DeltaReader.load(spark, baseA)
      .filter(col("n_regionkey") === 2)
      .orderBy(col("n_nationkey").desc).limit(4)
      .collect().map(_.getLong(0)).toSeq
    applyBoth(b => DeltaWriter.delete(spark, b,
      col("n_nationkey").isin(top4: _*)))
    val (s3, k3) = refreshBoth(3L)
    assert(s3 == 1L, s"got $s3")
    assert(k3 == 1L, s"exhausted sketch must rescan exactly its group, got $k3")

    // insert-only window regrows the popped sketches for free
    applyBoth(b => DeltaWriter.append(spark.range(2)
      .select((col("id") + 90L).as("n_nationkey"), lit(0L).as("n_regionkey")),
      b, Seq("n_regionkey")))
    val (s4, k4) = refreshBoth(4L)
    assert(s4 == 0L && k4 == 0L, s"got scalar=$s4 sketch=$k4")

    // and the regrown sketch again absorbs an extremum delete
    applyBoth(b => DeltaWriter.delete(spark, b, col("n_nationkey") === 91L))
    val (s5, k5) = refreshBoth(5L)
    assert(s5 == 1L && k5 == 0L, s"got scalar=$s5 sketch=$k5")

    // whole-group retraction vanishes from both
    applyBoth(b => DeltaWriter.delete(spark, b, col("n_regionkey") === 3))
    refreshBoth(6L)
    assert(!mvNow(mvA).contains(3L) && !mvNow(mvB).contains(3L))
  }

  test("refreshMinMaxSketched: duplicate values at the extremum subtract one instance per delete, never all") {
    val base = tmp("mmsk_dup_base"); val mv = tmp("mmsk_dup_mv")
    import spark.implicits._
    // group 'a': min value 1 appears THREE times; max 9 twice
    val rows = Seq(
      ("a", 1L, 0L), ("a", 1L, 1L), ("a", 1L, 2L),
      ("a", 5L, 3L), ("a", 9L, 4L), ("a", 9L, 5L),
      ("b", 4L, 6L), ("b", 7L, 7L))
      .toDF("k", "v", "id")
    DeltaWriter.append(rows, base, Seq("k"))
    def check(): Unit = {
      val full = DeltaReader.load(spark, base)
        .groupBy(col("k")).agg(count(lit(1)), min(col("v")), max(col("v")))
        .collect().map(r =>
          r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val got = DeltaReader.load(spark, mv)
        .collect().map(r => r.getAs[String]("key") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("mn"), r.getAs[Long]("mx"))))
        .toMap
      assert(got == full)
    }
    IncrementalAgg.refreshMinMaxSketched(spark, base, mv, "k", "v", k = 2)
    check()
    // delete ONE of the three tied minima: min must STAY 1 (two copies
    // remain) — array_remove-style remove-all would wrongly pop to 5.
    // With k=2 the sketch held [1,1]; one instance subtracts, one stays.
    DeltaWriter.deleteWithVectors(spark, base, col("id") === 0L)
    IncrementalAgg.refreshMinMaxSketched(spark, base, mv, "k", "v", k = 2)
    check()
    assert(IncrementalAgg.lastRescanGroups == 0L)
    // delete the second tied min: sketch [1,1] minus both copies
    // EXHAUSTS under a cut (value 5 unknown to a k=2 lo sketch after
    // two pops) — the rescan path must fire and still land exactly
    DeltaWriter.deleteWithVectors(spark, base, col("id") === 1L)
    IncrementalAgg.refreshMinMaxSketched(spark, base, mv, "k", "v", k = 2)
    check()
    // tied MAX side: delete one 9, max stays 9
    DeltaWriter.deleteWithVectors(spark, base, col("id") === 4L)
    IncrementalAgg.refreshMinMaxSketched(spark, base, mv, "k", "v", k = 2)
    check()
    assert(IncrementalAgg.lastRescanGroups == 0L)
  }

  test("IVM folds consume delta's cdc update images exactly (CDF-enabled base)") {
    import spark.implicits._
    val base = tmp("cdc_ivm_base"); val mv = tmp("cdc_ivm_mv")
    val mvMm = tmp("cdc_ivm_mvmm")
    // CDF-enabled at create: the update below writes cdc actions, so
    // the refresh windows fold update_preimage/update_postimage rows —
    // the event-classification matrix (InsertTypes/DeleteTypes) proven
    // end-to-end through a REAL cdc commit, not churn pairs
    DeltaWriter.overwrite(
      Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 7L), ("c", 100L))
        .toDF("k", "v"),
      base, properties = Map("delta.enableChangeDataFeed" -> "true"))
    IncrementalAgg.refresh(spark, base, mv, "k", "v")
    IncrementalAgg.refreshMinMax(spark, base, mvMm, "k", "v")
    // CoW update doubles b's values and moves a's max (cdc commit)
    DeltaWriter.update(spark, base,
      col("k") === "b" || col("v") === 20L,
      Map("v" -> (col("v") * 2)))
    IncrementalAgg.refresh(spark, base, mv, "k", "v")
    IncrementalAgg.refreshMinMax(spark, base, mvMm, "k", "v")
    def full(): Map[String, (Long, Long, Long, Long)] =
      DeltaReader.load(spark, base).groupBy(col("k"))
        .agg(count(lit(1)), sum(col("v")), min(col("v")), max(col("v")))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = full()
    val gotSum = DeltaReader.load(spark, mv).collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("total")))).toMap
    assert(gotSum == want.map { case (k, (n, t, _, _)) => k -> ((n, t)) })
    val gotMm = DeltaReader.load(spark, mvMm).collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mn"), r.getAs[Long]("mx"))))
      .toMap
    assert(gotMm == want.map { case (k, (n, _, mn, mx)) => k -> ((n, mn, mx)) })
    // a CoW delete on the same CDF-enabled base folds its exact cdc
    // 'delete' images too
    DeltaWriter.delete(spark, base, col("k") === "c")
    IncrementalAgg.refresh(spark, base, mv, "k", "v")
    IncrementalAgg.refreshMinMax(spark, base, mvMm, "k", "v")
    val want2 = full()
    assert(DeltaReader.load(spark, mv).collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("total")))).toMap ==
      want2.map { case (k, (n, t, _, _)) => k -> ((n, t)) })
    assert(DeltaReader.load(spark, mvMm).collect()
      .map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mn"), r.getAs[Long]("mx"))))
      .toMap ==
      want2.map { case (k, (n, _, mn, mx)) => k -> ((n, mn, mx)) })
  }

  test("refreshMinMaxSketched: seeded random churn stays exact against the full recompute") {
    // heavy duplication (12 distinct values over 120 rows, 3 groups) so
    // ties at the extrema, multi-instance subtraction, exhaustion and
    // regrowth all occur organically; the SEED pins the sequence so a
    // failure reproduces
    val rnd = new scala.util.Random(18L)
    val base = tmp("mmsk_rand_base"); val mv = tmp("mmsk_rand_mv")
    import spark.implicits._
    var nextId = 1000L
    def freshRows(n: Int) = (0 until n).map { _ =>
      nextId += 1
      ("g" + rnd.nextInt(3), rnd.nextInt(12).toLong, nextId)
    }
    DeltaWriter.append(
      (0 until 120).map(i =>
        ("g" + (i % 3), rnd.nextInt(12).toLong, i.toLong))
        .toDF("k", "v", "id"),
      base, Seq("k"))
    def check(): Unit = {
      val full = DeltaReader.load(spark, base)
        .groupBy(col("k")).agg(count(lit(1)), min(col("v")), max(col("v")))
        .collect().map(r =>
          r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val got = DeltaReader.load(spark, mv)
        .collect().map(r => r.getAs[String]("key") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("mn"), r.getAs[Long]("mx"))))
        .toMap
      assert(got == full)
      // per-group state-budget INVARIANT (MaxSketchK's contract):
      // every published lo/hi sketch is truncated back to <= k — churn
      // and regrowth never leave an oversized array in stored state
      DeltaReader.load(spark, mv)
        .select(size(col("lo")).as("nl"), size(col("hi")).as("nh"))
        .collect().foreach { r =>
          assert(r.getInt(0) <= 3 && r.getInt(1) <= 3,
            s"sketch outgrew its k=3 budget: lo=${r.getInt(0)} hi=${r.getInt(1)}")
        }
    }
    IncrementalAgg.refreshMinMaxSketched(spark, base, mv, "k", "v", k = 3)
    check()
    (1 to 6).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 => // CoW delete of a whole value class (often an extremum)
          DeltaWriter.delete(spark, base,
            col("v") === rnd.nextInt(12).toLong)
        case 1 => // DV delete of a scattered id class
          DeltaWriter.deleteWithVectors(spark, base,
            col("id") % (2L + rnd.nextInt(5)) === 0L)
        case 2 => // insert wave (regrows popped sketches)
          DeltaWriter.append(freshRows(10).toDF("k", "v", "id"),
            base, Seq("k"))
      }
      IncrementalAgg.refreshMinMaxSketched(spark, base, mv, "k", "v", k = 3)
      check()
    }

    // the k cap refuses with the budget named — on both the poll verb
    // and the streaming fold (MaxSketchK: per-group state is 2k longs +
    // a 2k+1 delete collection per window; deeper churn is rescan
    // territory by design, not a deeper sketch)
    val cap = IncrementalAgg.MaxSketchK
    val e1 = intercept[IllegalArgumentException] {
      IncrementalAgg.refreshMinMaxSketched(spark, base, mv, "k", "v",
        k = cap + 1)
    }
    assert(e1.getMessage.contains(s"[1, $cap]"))
    val e2 = intercept[IllegalArgumentException] {
      IncrementalAgg.foldEventsMinMaxSketched(
        DeltaReader.load(spark, base).limit(0)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(0L)),
        base, mv, "k", "v", upto = 99L, k = cap + 1)
    }
    assert(e2.getMessage.contains(s"[1, $cap]"))
  }

  test("refreshMinMax: NULL group keys merge; watermark survives a fully-retracted 0-row state") {
    import spark.implicits._
    val base = tmp("minmax_null_base"); val mv = tmp("minmax_null_mv")
    def mvNow(): Map[String, (Long, Long, Long)] =
      DeltaReader.load(spark, mv)
        .collect().map(r => r.getAs[String]("key") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("mn"),
            r.getAs[Long]("mx")))).toMap
    // seed a NULL-key group alongside a real one
    DeltaWriter.append(Seq((10L, "A"), (5L, "A"),
      (7L, null.asInstanceOf[String]))
      .toDF("v", "k"), base)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v")
    assert(mvNow() == Map("A" -> ((2L, 5L, 10L)),
      (null: String) -> ((1L, 7L, 7L))))
    // insert into the NULL group: must MERGE into one row, not duplicate
    DeltaWriter.append(Seq((3L, null.asInstanceOf[String])).toDF("v", "k"), base)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v")
    assert(mvNow() == Map("A" -> ((2L, 5L, 10L)),
      (null: String) -> ((2L, 3L, 7L))))
    // delete the NULL group's extremum: the targeted rescan must find
    // the NULL-keyed rows (null-safe semi-join), surfacing next-best 7
    DeltaWriter.delete(spark, base, col("v") === 3L)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v")
    assert(mvNow() == Map("A" -> ((2L, 5L, 10L)),
      (null: String) -> ((1L, 7L, 7L))))
    // retract EVERYTHING: watermark rides the table property through
    // the 0-row state, and the next refresh folds incrementally (no
    // NPE, no bootstrap double-count)
    DeltaWriter.delete(spark, base, lit(true))
    val v = IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v")
    assert(DeltaReader.load(spark, mv).count() == 0L)
    assert(IncrementalAgg.watermark(spark, mv).contains(v))
    DeltaWriter.append(Seq((42L, "B")).toDF("v", "k"), base)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v")
    assert(mvNow() == Map("B" -> ((1L, 42L, 42L))))
  }

  test("refreshMinMax: NULL-VALUED deletes keep the group (they cannot move the bounds)") {
    import spark.implicits._
    val base = tmp("minmax_nullval_base"); val mv = tmp("minmax_nullval_mv")
    def full(): Map[String, (Long, Option[Long], Option[Long])] =
      DeltaReader.load(spark, base)
        .groupBy(col("k"))
        .agg(count(lit(1)), min(col("v")), max(col("v")))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    def mvNow(): Map[String, (Long, Option[Long], Option[Long])] =
      DeltaReader.load(spark, mv)
        .collect().map(r => r.getAs[String]("key") ->
          ((r.getAs[Long]("n"),
            if (r.isNullAt(r.fieldIndex("mn"))) None
            else Some(r.getAs[Long]("mn")),
            if (r.isNullAt(r.fieldIndex("mx"))) None
            else Some(r.getAs[Long]("mx"))))).toMap
    def check(): Unit = assert(mvNow() == full())
    // group A carries a NULL value among real ones; group B is all-NULL
    DeltaWriter.append(Seq(
      (1L, Some(1L), "A"), (2L, Some(2L), "A"), (3L, None, "A"),
      (4L, None, "B"), (5L, None, "B")).toDF("id", "v", "k"), base)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v"); check()
    // delete A's NULL row: mn_d/mx_d are NULL (min/max skip NULLs) —
    // the group must LAND IN `kept` with unchanged bounds, not vanish
    // from both branches on a NULL `touches` predicate (the regression)
    DeltaWriter.delete(spark, base, col("id") === 3L)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v"); check()
    assert(mvNow()("A") == ((2L, Some(1L), Some(2L))))
    // delete one of B's NULL rows: all-NULL group shrinks, stays NULL-bounded
    DeltaWriter.delete(spark, base, col("id") === 4L)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v"); check()
    assert(mvNow()("B") == ((1L, None, None)))
    // mixed window: a NULL-valued insert + an extremum delete in the
    // same group — the rescan's fullAgg must skip NULLs exactly
    DeltaWriter.append(Seq((6L, None: Option[Long], "A")).toDF("id", "v", "k"), base)
    DeltaWriter.delete(spark, base, col("v") === 2L)
    IncrementalAgg.refreshMinMax(spark, base, mv, "k", "v"); check()
    assert(mvNow()("A") == ((2L, Some(1L), Some(1L))))
  }

  test("watermark survives a fully-retracted 0-row state; NULL group keys merge, never duplicate") {
    import spark.implicits._
    val base = tmp("retract_all_base")
    val mv = tmp("retract_all_mv")
    // seed with a NULL-key group alongside real keys
    val rows = Seq(
      (1L, 100.0, "A"), (2L, 50.0, "A"), (3L, 25.0, null.asInstanceOf[String]))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    DeltaWriter.append(rows, base)
    IncrementalAgg.refresh(spark, base, mv,
      "o_orderpriority", "CAST(round(o_totalprice * 100) AS BIGINT)")
    assert(mvRows(mv) == Map[String, (Long, Long)]("A" -> ((2L, 15000L)),
      (null: String) -> ((1L, 2500L))))
    // retract EVERYTHING: the mv goes to zero data rows but the
    // watermark rides the table property, atomically with the swap
    DeltaWriter.delete(spark, base, lit(true))
    val v1 = IncrementalAgg.refresh(spark, base, mv,
      "o_orderpriority", "CAST(round(o_totalprice * 100) AS BIGINT)")
    assert(DeltaReader.load(spark, mv).count() == 0L)
    assert(IncrementalAgg.watermark(spark, mv).contains(v1))
    // a later feed folds INCREMENTALLY from the retained watermark —
    // no NPE on the empty state, no bootstrap double-count — and the
    // NULL group merges into ONE row across two separate folds
    DeltaWriter.append(Seq((4L, 10.0, null.asInstanceOf[String]))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority"), base)
    IncrementalAgg.refresh(spark, base, mv,
      "o_orderpriority", "CAST(round(o_totalprice * 100) AS BIGINT)")
    DeltaWriter.append(Seq((5L, 20.0, null.asInstanceOf[String]))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority"), base)
    IncrementalAgg.refresh(spark, base, mv,
      "o_orderpriority", "CAST(round(o_totalprice * 100) AS BIGINT)")
    assert(mvRows(mv) == Map[String, (Long, Long)]((null: String) -> ((2L, 3000L))))
    // and a redelivered window no-ops against the property watermark
    val w = IncrementalAgg.watermark(spark, mv).get
    val replay = DeltaReader.loadChangeFeed(spark, base, w - 1, w)
    IncrementalAgg.foldEvents(replay, mv,
      "o_orderpriority", "CAST(round(o_totalprice * 100) AS BIGINT)", w)
    assert(mvRows(mv) == Map[String, (Long, Long)]((null: String) -> ((2L, 3000L))))
  }
}

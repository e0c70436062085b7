package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{DeltaReader, DeltaWriter}

/** Incremental aggregate maintenance (IVM) — the CDC feed's consumer:
  * keep a grouped COUNT/SUM materialization of a Delta base table
  * fresh by folding in ONLY the rows committed since the last refresh,
  * never re-scanning the base. At 100 TB this is the difference
  * between a dashboard refresh that reads one micro-batch's worth of
  * changes and one that reads the table.
  *
  * The state is self-describing: the materialization is itself a Delta
  * table of `(key, n, total, __upto)` rows where `__upto` (identical on
  * every row, metadata by construction) records the base version the
  * materialization reflects — so `refresh` needs no side-channel
  * ledger, and the refresh itself is ATOMIC ([[DeltaWriter.overwrite]]
  * publishes new rows + new `__upto` in one commit; a reader of the
  * materialization always sees a consistent (rows, version) pair).
  *
  * Correctness rests on COUNT/SUM being mergeable partial aggregates
  * with EXACT RETRACTIONS: the full change feed (`loadChangeFeed`)
  * emits every row mutation as signed insert/delete events, so a
  * delete subtracts (1, value) exactly where the original insert
  * added it — the merge is one full-outer join of the tiny
  * materialization with the window's signed partial aggregate, and
  * groups whose count retracts to zero are dropped (a full recompute
  * would not contain them). Sums stay exact integers (cents
  * discipline). AVG derives from (n, total); non-mergeable aggregates
  * (exact distinct) need the base scan by nature.
  *
  * MIN/MAX are NOT retractable from scalar state by nature — a delete
  * of the stored extremum leaves the next-best value unknown.
  * [[refreshMinMax]] draws the exact boundary: inserts merge for free
  * (min/max are insert-mergeable), and ONLY the groups whose deleted
  * values touch the stored extrema take a TARGETED base re-scan (a
  * key semi-join — every untouched group keeps its state, so the cost
  * is proportional to the retraction's blast radius, never the
  * materialization).
  */
object IncrementalAgg {

  /** CDF event classification: delta's update spellings fold as their
    * halves — `update_postimage` is insert-signed, `update_preimage`
    * retracts ([[graft.sources.DeltaReader.loadChangeFeed]] emits them
    * for commits carrying cdc actions; cdc-less update commits still
    * reduce to plain insert/delete pairs). */
  private[graft] val InsertTypes = Seq("insert", "update_postimage")
  private[graft] val DeleteTypes = Seq("delete", "update_preimage")

  /** Refresh (or create) the materialization at `mvPath` for
    * `SELECT key, count(*), sum(valueExpr) FROM base GROUP BY key`,
    * folding in only base versions `(lastUpto .. latest]` — appends
    * ADD, deletes/updates (copy-on-write or deletion-vector) RETRACT,
    * layout maintenance (compact/z-order) folds in nothing. Returns
    * the base version now reflected. No-op (returns lastUpto) when the
    * base has nothing new. Bootstrap (no materialization yet) scans
    * the base snapshot directly — cheaper than replaying the whole
    * history as a feed, and immune to log cleanup. */
  def refresh(spark: SparkSession, basePath: String, mvPath: String,
      keyCol: String, valueExpr: String): Long = {
    val baseVersion = DeltaReader.snapshot(spark, basePath).version
    val lastUpto = watermark(spark, mvPath).getOrElse(-1L)
    if (lastUpto >= baseVersion) return lastUpto
    if (lastUpto < 0L) {
      // bootstrap: snapshot scan, cheaper than replaying history as a
      // feed and immune to log cleanup
      val boot = DeltaReader.loadAt(spark, basePath, baseVersion)
        .groupBy(col(keyCol).as("key"))
        .agg(count(lit(1)).as("n"), sum(expr(valueExpr)).as("total"))
      publishMv(boot, mvPath, baseVersion)
    } else {
      val sign = when(col("_change_type").isin(InsertTypes: _*), 1L)
        .otherwise(-1L)
      val delta = DeltaReader.loadChangeFeed(spark, basePath,
        lastUpto, baseVersion)
        .groupBy(col(keyCol).as("key"))
        .agg(sum(sign).as("n"),
          sum(sign * expr(valueExpr)).as("total"))
      publishMv(mergeDelta(spark, mvPath, delta), mvPath, baseVersion)
    }
    baseVersion
  }

  /** The base version the materialization reflects: the
    * `graft.ivm.upto` table property first (published ATOMICALLY with
    * every fold — so it survives even an all-groups-retracted, 0-row
    * state), the rows' `__upto` as the legacy fallback. None = no
    * materialization yet. */
  private[graft] def watermark(spark: SparkSession,
      mvPath: String): Option[Long] =
    if (!DeltaWriter.tableExists(mvPath)) None
    else DeltaReader.snapshot(spark, mvPath)
      .configuration.get(UptoProp).map(_.toLong)
      .orElse {
        val row = DeltaReader.load(spark, mvPath)
          .select(max(col("__upto"))).head()
        if (row.isNullAt(0)) None else Some(row.getLong(0))
      }

  private[graft] val UptoProp = "graft.ivm.upto"

  /** Merge a signed `(key, n, total)` delta into the existing
    * materialization: one full-outer join against the group-count-sized
    * state, NULL-SAFE on the key (a NULL group must merge, not
    * duplicate), fully-retracted groups dropped. */
  private def mergeDelta(spark: SparkSession, mvPath: String,
      delta: DataFrame): DataFrame =
    DeltaReader.load(spark, mvPath)
      .select(col("key"), col("n"), col("total")).as("m")
      .join(delta.as("d"), col("m.key") <=> col("d.key"), "full_outer")
      .select(
        coalesce(col("m.key"), col("d.key")).as("key"),
        (coalesce(col("m.n"), lit(0L)) +
          coalesce(col("d.n"), lit(0L))).as("n"),
        (coalesce(col("m.total"), lit(0L)) +
          coalesce(col("d.total"), lit(0L))).as("total"))

  /** Atomic publish: rows (+ legacy `__upto` column) AND the watermark
    * property land in ONE overwrite commit. */
  private def publishMv(merged: DataFrame, mvPath: String,
      upto: Long): Unit = {
    try DeltaWriter.overwrite(
      merged.filter(col("n") =!= 0L) // fully-retracted groups vanish
        .withColumn("__upto", lit(upto)), mvPath,
      properties = Map(UptoProp -> upto.toString))
    finally {
      pendingUnpersist.foreach(_.unpersist())
      pendingUnpersist = None
    }
    ()
  }

  /** Fold ONE exact commit-window of signed CDF events (the streaming
    * source's batch shape — `_change_type`/`_commit_version` columns)
    * into the materialization; `upto` = the window's top version.
    * Idempotent: a window at-or-below the current watermark no-ops —
    * the redelivery guard [[graft.streaming.StreamIvm]]'s exactly-once
    * rests on. Bootstrap folds the window as the initial state (the
    * streaming source replays history as inserts from version 0). */
  private[graft] def foldEvents(events: DataFrame, mvPath: String,
      keyCol: String, valueExpr: String, upto: Long): Long = {
    val spark = events.sparkSession
    val last = watermark(spark, mvPath)
    if (last.exists(_ >= upto)) return last.get // redelivered: no-op
    val sign = when(col("_change_type").isin(InsertTypes: _*), 1L)
      .otherwise(-1L)
    val delta = events
      .groupBy(col(keyCol).as("key"))
      .agg(sum(sign).as("n"), sum(sign * expr(valueExpr)).as("total"))
    val merged =
      if (last.isEmpty) delta else mergeDelta(spark, mvPath, delta)
    publishMv(merged, mvPath, upto)
    upto
  }

  /** MIN/MAX materialization `(key, n, mn, mx, __upto)` maintained
    * through retractions. Insert events merge into the state for free
    * (`least`/`greatest`); a group is re-scanned from the base ONLY
    * when a deleted value reaches its candidate extremum (delete
    * strictly inside `(mn, mx)` cannot move either end) — the
    * targeted-rescan spelling of the boundary [[refresh]]'s scaladoc
    * draws. The rescan is one key-semi-joined aggregate over the base
    * snapshot: with few touched groups the join side is broadcast-tiny
    * and stats/partition pruning limit the scan; worst case (every
    * group's extremum deleted) degrades to the full recompute this
    * verb exists to avoid — the right tool for extremum-heavy churn is
    * a per-group value sketch, documented out of scope. Same atomic
    * publish + self-describing `__upto` contract as [[refresh]]. */
  def refreshMinMax(spark: SparkSession, basePath: String, mvPath: String,
      keyCol: String, valueExpr: String): Long = {
    val baseVersion = DeltaReader.snapshot(spark, basePath).version
    val lastUpto = watermark(spark, mvPath).getOrElse(-1L)
    if (lastUpto >= baseVersion) return lastUpto
    val merged =
      if (lastUpto < 0L)
        fullMinMaxAgg(DeltaReader.loadAt(spark, basePath, baseVersion),
          keyCol, valueExpr)
      else mergeMinMax(spark, mvPath,
        DeltaReader.loadChangeFeed(spark, basePath, lastUpto, baseVersion),
        DeltaReader.loadAt(spark, basePath, baseVersion),
        keyCol, valueExpr, bootstrap = false)
    publishMv(merged, mvPath, baseVersion)
    baseVersion
  }

  private def fullMinMaxAgg(df: DataFrame, keyCol: String,
      valueExpr: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        min(expr(valueExpr)).as("mn"), max(expr(valueExpr)).as("mx"))

  /** The MIN/MAX merge both the poll verb ([[refreshMinMax]]) and the
    * streaming fold ([[foldEventsMinMax]]) share: fold one signed
    * change window into the materialization, with targeted rescans
    * against `base` — the base SNAPSHOT AT THE WINDOW'S TOP VERSION
    * (immutable, so a redelivered window rescans identically).
    * `bootstrap` substitutes an empty state for a not-yet-created
    * materialization — the window then IS the initial state, with
    * same-window deletes (a multi-commit first window) still routed
    * through the exact rescan path. */
  private def mergeMinMax(spark: SparkSession, mvPath: String,
      feed: DataFrame, base: DataFrame, keyCol: String, valueExpr: String,
      bootstrap: Boolean): DataFrame = {
    val mv =
      if (bootstrap) fullMinMaxAgg(base.limit(0), keyCol, valueExpr)
      else DeltaReader.load(spark, mvPath)
        .select(col("key"), col("n"), col("mn"), col("mx"))
    val ins = feed.filter(col("_change_type").isin(InsertTypes: _*))
      .groupBy(col(keyCol).as("k_i"))
      .agg(count(lit(1)).as("n_i"),
        min(expr(valueExpr)).as("mn_i"), max(expr(valueExpr)).as("mx_i"))
    val del = feed.filter(col("_change_type").isin(DeleteTypes: _*))
      .groupBy(col(keyCol).as("k_d"))
      .agg(count(lit(1)).as("n_d"),
        min(expr(valueExpr)).as("mn_d"), max(expr(valueExpr)).as("mx_d"))
    // NULL-SAFE key joins ([[mergeDelta]]'s contract): a NULL group
    // must merge with its deltas, never split into duplicate rows
    val joined = mv
      .join(ins, col("key") <=> col("k_i"), "full_outer")
      .join(del, coalesce(col("key"), col("k_i")) <=> col("k_d"),
        "full_outer")
      .select(coalesce(col("key"), col("k_i"), col("k_d")).as("key"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("n_i"), lit(0L)) -
          coalesce(col("n_d"), lit(0L))).as("n2"),
        // least/greatest skip NULLs: a brand-new group takes the
        // insert bounds, an untouched group keeps its state
        least(col("mn"), col("mn_i")).as("cand_mn"),
        greatest(col("mx"), col("mx_i")).as("cand_mx"),
        col("n_d"), col("mn_d"), col("mx_d"))
      .filter(col("n2") > 0L) // fully-retracted groups vanish
      // group-count-sized; persisted so the kept/rescan branches (and
      // the rescan-count diagnostic) scan the feed ONCE, not per branch
      .persist()
    // a delete at (or past — duplicates) a candidate extremum makes
    // the true extremum underivable from state → targeted rescan.
    // All-NULL deletes (mn_d/mx_d NULL — min/max skip NULLs) cannot
    // move the bounds; coalesce(…, false) routes them into `kept`
    // instead of NULL-dropping the group from BOTH branches.
    val touches = col("n_d").isNotNull &&
      coalesce(
        col("mn_d") <= col("cand_mn") || col("mx_d") >= col("cand_mx"),
        lit(false))
    val kept = joined.filter(!touches)
      .select(col("key"), col("n2").as("n"),
        col("cand_mn").as("mn"), col("cand_mx").as("mx"))
    val rescanKeys = joined.filter(touches).select(col("key"))
    lastRescanGroups = rescanKeys.count() // materializes the persist
    val rescanned = fullMinMaxAgg(
      base.join(broadcast(rescanKeys),
        col(keyCol) <=> rescanKeys("key"), "left_semi"),
      keyCol, valueExpr)
    pendingUnpersist = Some(joined)
    kept.unionByName(rescanned)
  }

  /** The persisted per-merge join, released by [[publishMv]] after the
    * atomic overwrite consumed it. THREAD-LOCAL: set and cleared
    * within one refresh/fold call chain on one thread, so two
    * concurrent maintenance pipelines (e.g. two StreamIvm queries on
    * different MVs, each on its own micro-batch thread) can never
    * release each other's persisted frame mid-consumption. */
  private val pendingUnpersistTl =
    new ThreadLocal[Option[DataFrame]] {
      override def initialValue(): Option[DataFrame] = None
    }
  private def pendingUnpersist: Option[DataFrame] = pendingUnpersistTl.get()
  private def pendingUnpersist_=(v: Option[DataFrame]): Unit =
    pendingUnpersistTl.set(v)

  /** How many groups the LAST MIN/MAX refresh re-scanned — the
    * observable the sketched verb's rescan-avoidance contract is
    * spec'd against. DIAGNOSTIC ONLY: a plain volatile (readable from
    * the driver thread after a streaming fold ran on its micro-batch
    * thread), meaningful only when one maintenance pipeline runs at a
    * time — concurrent refreshes interleave their counts. */
  @volatile private[graft] var lastRescanGroups: Long = -1L

  /** MIN/MAX maintenance with per-group VALUE SKETCHES — the
    * documented ESCALATION for extremum-heavy churn (the boundary
    * [[refreshMinMax]]'s scaladoc draws): the materialization is
    * `(key, n, mn, mx, lo, hi)` where `lo` holds the group's k
    * smallest values (an ascending multiset PREFIX) and `hi` its k
    * largest, so a deleted extremum usually just pops the sketch — the
    * next-best value is already in state — instead of forcing a base
    * rescan. A rescan happens ONLY when a sketch EXHAUSTS: k deletes
    * landed at one extreme end of one group inside a single refresh
    * window (or the bounded delete-collection overflowed — see below).
    * [[lastRescanGroups]] is the observable; the spec contrasts it
    * against the scalar verb on the same churn.
    *
    * The exactness argument, per group and per refresh window:
    *  - `lo` is maintained as a true prefix: the merge pool is
    *    `lo_state ∪ ins_lo` cut at the conservative boundary (the
    *    smaller last-element of any TRUNCATED side; a side holding its
    *    whole multiset contributes no cut) — every merged-multiset
    *    value at-or-below the cut is in the pool, so subtracting the
    *    at-or-below-cut deletes (one instance each — they provably
    *    match) leaves a valid prefix, truncated back to k;
    *  - deletes are collected BOUNDED: the 2k+1 smallest (largest for
    *    `hi`) per group; a pool of ≤ 2k elements is provably exhausted
    *    by 2k+1 applicable deletes, so an overflowing collection
    *    routes to the rescan instead of silently under-subtracting;
    *  - NULL values never enter a sketch (min/max skip NULLs; ranking
    *    is nulls-last so they displace nothing) but do count in `n`,
    *    which only makes the cut conservative — the prefix property
    *    holds, the sketch just regrows lazily;
    *  - `hi` runs the same machinery on NEGATED values (stored
    *    un-negated, ascending).
    *
    * Values are cast to LONG (the cents discipline — the sketch verb
    * is for integral measures; Long.MinValue excluded by the
    * negation). Same atomic publish, `__upto` watermark and targeted
    * key-semi-joined rescan as the scalar verb. */
  /** Upper bound on the sketch depth `k` — a per-group STATE BUDGET,
    * not a free tuning knob: the materialization carries two k-element
    * long arrays per group (lo/hi), each refresh additionally collects
    * a 2k+1-bounded delete list per touched group, and the merge's
    * full-outer join ships all of it per group. 256 caps per-group
    * sketch state at ~4 KiB, so a 10⁹-group mv stays ~4 TB of
    * DISK-backed delta at worst (never driver memory) and the join
    * rows stay cache-line-friendly. Churn deep enough to exhaust a
    * 256-value prefix inside one refresh window is rescan territory BY
    * DESIGN — the targeted key-semi-joined rescan is the escape hatch,
    * not an ever-deeper sketch. Every publish path truncates lo/hi
    * back to ≤ k, so the bound is an INVARIANT of the stored state
    * (spec-pinned under seeded churn), not a hope. */
  private[graft] val MaxSketchK = 256

  def refreshMinMaxSketched(spark: SparkSession, basePath: String,
      mvPath: String, keyCol: String, valueExpr: String,
      k: Int = 8): Long = {
    require(k >= 1 && k <= MaxSketchK,
      s"refreshMinMaxSketched: k must be in [1, $MaxSketchK] " +
        s"(per-group state budget — see MaxSketchK), got $k")
    val baseVersion = DeltaReader.snapshot(spark, basePath).version
    val lastUpto = watermark(spark, mvPath).getOrElse(-1L)
    if (lastUpto >= baseVersion) return lastUpto
    val merged =
      if (lastUpto < 0L)
        fullSketchAgg(DeltaReader.loadAt(spark, basePath, baseVersion),
          keyCol, valueExpr, k)
      else mergeMinMaxSketched(spark, mvPath,
        DeltaReader.loadChangeFeed(spark, basePath, lastUpto, baseVersion),
        DeltaReader.loadAt(spark, basePath, baseVersion),
        keyCol, valueExpr, k, bootstrap = false)
    publishMv(merged, mvPath, baseVersion)
    baseVersion
  }

  /** (key, n, mn, mx, lo, hi) over a full scan: one shuffle, the two
    * rank columns ride the same key partitioning, the collects are
    * rank-bounded (never whole-group memory). */
  private def fullSketchAgg(df: DataFrame, keyCol: String,
      valueExpr: String, bound: Int): DataFrame = {
    val vv = expr(valueExpr).cast("long")
    df.select(col(keyCol).as("key"), vv.as("v"))
      .withColumn("ra", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("v").asc_nulls_last)))
      .withColumn("rd", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("v").desc_nulls_last)))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"),
        sort_array(collect_list(when(col("ra") <= bound, col("v"))))
          .as("lo"),
        sort_array(collect_list(when(col("rd") <= bound, col("v"))))
          .as("hi"))
  }

  /** The SKETCHED merge both the poll verb and the streaming fold
    * share — one signed window folded into the sketch-carrying
    * materialization, rescans against `base` (the snapshot AT the
    * window's top version). See [[refreshMinMaxSketched]] for the
    * exactness argument. */
  private def mergeMinMaxSketched(spark: SparkSession, mvPath: String,
      feed: DataFrame, base: DataFrame, keyCol: String, valueExpr: String,
      k: Int, bootstrap: Boolean): DataFrame = {
    val cap = 2 * k + 1
        val ins = fullSketchAgg(
          feed.filter(col("_change_type").isin(InsertTypes: _*)),
          keyCol, valueExpr, k)
          .select(col("key").as("k_i"), col("n").as("n_i"),
            col("lo").as("ins_lo"), col("hi").as("ins_hi"))
        val del = fullSketchAgg(
          feed.filter(col("_change_type").isin(DeleteTypes: _*)),
          keyCol, valueExpr, cap)
          .select(col("key").as("k_d"), col("n").as("n_d"),
            col("lo").as("del_lo"), col("hi").as("del_hi"))
        val mv =
          if (bootstrap)
            fullSketchAgg(base.limit(0), keyCol, valueExpr, k)
              .select(col("key"), col("n"), col("lo"), col("hi"))
          else DeltaReader.load(spark, mvPath)
            .select(col("key"), col("n"), col("lo"), col("hi"))
        val emptyArr = typedLit(Seq.empty[Long])
        val joined = mv
          .join(ins, col("key") <=> col("k_i"), "full_outer")
          .join(del, coalesce(col("key"), col("k_i")) <=> col("k_d"),
            "full_outer")
          .select(coalesce(col("key"), col("k_i"), col("k_d")).as("key"),
            coalesce(col("n"), lit(0L)).as("n0"),
            coalesce(col("lo"), emptyArr).as("lo0"),
            coalesce(col("hi"), emptyArr).as("hi0"),
            coalesce(col("n_i"), lit(0L)).as("n_i"),
            coalesce(col("ins_lo"), emptyArr).as("ins_lo"),
            coalesce(col("ins_hi"), emptyArr).as("ins_hi"),
            coalesce(col("n_d"), lit(0L)).as("n_d"),
            coalesce(col("del_lo"), emptyArr).as("del_lo"),
            coalesce(col("del_hi"), emptyArr).as("del_hi"))
          .withColumn("n2",
            col("n0") + col("n_i") - col("n_d"))
          .filter(col("n2") > 0L) // fully-retracted groups vanish
          // the lo machinery, then the same on negated values for hi
          // (negation first so ONE spelling serves both ends)
          .withColumn("nhi0", expr("array_sort(transform(hi0, x -> -x))"))
          .withColumn("ins_nhi",
            expr("array_sort(transform(ins_hi, x -> -x))"))
          .withColumn("del_nhi",
            expr("array_sort(transform(del_hi, x -> -x))"))
          .persist()

        // per end: the conservative cut (NULL = no cut: both sides
        // hold their whole multisets), the cut-filtered merge pool,
        // the one-instance-per-delete multiset subtraction, and the
        // exhaustion/overflow rescan test
        def endCols(df: DataFrame, st: String, in: String, dl: String,
            suffix: String): DataFrame = df
          // a side is TRUNCATED only when nonempty: an EMPTY sketch
          // with a positive count is an all-NULL-valued multiset —
          // every publish path (full agg, kept-branch slice) emits a
          // nonempty sketch whenever a non-null value exists — so it
          // is COMPLETE over non-nulls and contributes no cut
          .withColumn(s"cut$suffix", expr(s"""
            CASE WHEN n0 > size($st) AND size($st) > 0
                   AND n_i > size($in) AND size($in) > 0
                   THEN least(element_at($st, -1), element_at($in, -1))
                 WHEN n0 > size($st) AND size($st) > 0
                   THEN element_at($st, -1)
                 WHEN n_i > size($in) AND size($in) > 0
                   THEN element_at($in, -1)
                 ELSE CAST(NULL AS BIGINT) END"""))
          .withColumn(s"pool$suffix", expr(s"""
            filter(array_sort(concat($st, $in)),
              x -> cut$suffix IS NULL OR x <= cut$suffix)"""))
          .withColumn(s"left$suffix", expr(s"""
            aggregate(
              filter($dl, x -> cut$suffix IS NULL OR x <= cut$suffix),
              pool$suffix,
              (acc, d) -> CASE WHEN array_position(acc, d) > 0 THEN
                concat(
                  slice(acc, 1, CAST(array_position(acc, d) AS INT) - 1),
                  slice(acc, CAST(array_position(acc, d) AS INT) + 1,
                    size(acc)))
                ELSE acc END)"""))
          // rescan iff the sketch stops PROVING the extremum: the pool
          // emptied while a cut hides unknown values, or the bounded
          // delete collection filled (size == cap: maybe-uncollected
          // deletes could under-subtract) with its reach at-or-below
          // the cut. An empty pool under NO cut is complete knowledge
          // — the group's non-null values are genuinely gone — and
          // publishes as an empty sketch with NULL extrema, no rescan.
          .withColumn(s"rescan$suffix", expr(s"""
            CASE WHEN size(left$suffix) = 0 AND cut$suffix IS NOT NULL
                   THEN true
                 WHEN size($dl) < $cap THEN false
                 WHEN cut$suffix IS NULL THEN true
                 ELSE element_at($dl, -1) <= cut$suffix END"""))

        val scored = endCols(
          endCols(joined, "lo0", "ins_lo", "del_lo", "_lo"),
          "nhi0", "ins_nhi", "del_nhi", "_hi")
        val touched = col("rescan_lo") || col("rescan_hi")
        val kept = scored.filter(!touched)
          .withColumn("new_lo", expr(s"slice(left_lo, 1, $k)"))
          .withColumn("new_hi", expr(
            s"array_sort(transform(slice(left_hi, 1, $k), x -> -x))"))
          .select(col("key"), col("n2").as("n"),
            // empty sketch (all surviving rows NULL-valued) → NULL
            // extrema, exactly what min/max over the group computes
            expr("""CASE WHEN size(new_lo) = 0 THEN CAST(NULL AS BIGINT)
                 ELSE element_at(new_lo, 1) END""").as("mn"),
            expr("""CASE WHEN size(new_hi) = 0 THEN CAST(NULL AS BIGINT)
                 ELSE element_at(new_hi, -1) END""").as("mx"),
            col("new_lo").as("lo"), col("new_hi").as("hi"))
        val rescanKeys = scored.filter(touched).select(col("key"))
        lastRescanGroups = rescanKeys.count() // materializes the persist
        val rescanned = fullSketchAgg(
          base.join(broadcast(rescanKeys),
            col(keyCol) <=> rescanKeys("key"), "left_semi"),
          keyCol, valueExpr, k)
        pendingUnpersist = Some(joined) // the persisted frame itself
        kept.unionByName(rescanned)
  }

  /** [[foldEventsMinMax]]'s SKETCHED twin — the per-trigger verb for
    * extremum-heavy churn on a stream: one signed CDF window folded
    * into the sketch-carrying materialization, rescans riding the base
    * snapshot AT `upto`, same watermark no-op exactly-once. */
  private[graft] def foldEventsMinMaxSketched(events: DataFrame,
      basePath: String, mvPath: String, keyCol: String, valueExpr: String,
      upto: Long, k: Int = 8): Long = {
    require(k >= 1 && k <= MaxSketchK,
      s"foldEventsMinMaxSketched: k must be in [1, $MaxSketchK] " +
        s"(per-group state budget — see MaxSketchK), got $k")
    val spark = events.sparkSession
    val last = watermark(spark, mvPath)
    if (last.exists(_ >= upto)) return last.get // redelivered: no-op
    // bootstrap substitutes an empty state — a first window carrying
    // deletes (multi-commit replay) still routes through the exact
    // rescan path, like the scalar fold
    val merged = mergeMinMaxSketched(spark, mvPath, events,
      DeltaReader.loadAt(spark, basePath, upto),
      keyCol, valueExpr, k, bootstrap = last.isEmpty)
    publishMv(merged, mvPath, upto)
    upto
  }

  /** Fold ONE exact commit-window of signed CDF events into the
    * MIN/MAX materialization — [[foldEvents]]'s extremum twin, the
    * per-trigger verb [[graft.streaming.StreamIvm]]'s MIN/MAX pipeline
    * rides. Needs `basePath` (unlike the COUNT/SUM fold): an extremum
    * retraction is not derivable from scalar state, so touched groups
    * take a targeted rescan of the base snapshot AT `upto` — the
    * window's own top version, an immutable read, so a redelivered
    * window rescans bit-identically and the watermark no-op keeps the
    * fold exactly-once. */
  private[graft] def foldEventsMinMax(events: DataFrame, basePath: String,
      mvPath: String, keyCol: String, valueExpr: String, upto: Long): Long = {
    val spark = events.sparkSession
    val last = watermark(spark, mvPath)
    if (last.exists(_ >= upto)) return last.get // redelivered: no-op
    val merged = mergeMinMax(spark, mvPath, events,
      DeltaReader.loadAt(spark, basePath, upto),
      keyCol, valueExpr, bootstrap = last.isEmpty)
    publishMv(merged, mvPath, upto)
    upto
  }
}

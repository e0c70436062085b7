package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      val sign = when(col("_change_type") === "insert", 1L)
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
    DeltaWriter.overwrite(
      merged.filter(col("n") =!= 0L) // fully-retracted groups vanish
        .withColumn("__upto", lit(upto)), mvPath,
      properties = Map(UptoProp -> upto.toString))
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
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
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
    val ins = feed.filter(col("_change_type") === "insert")
      .groupBy(col(keyCol).as("k_i"))
      .agg(count(lit(1)).as("n_i"),
        min(expr(valueExpr)).as("mn_i"), max(expr(valueExpr)).as("mx_i"))
    val del = feed.filter(col("_change_type") === "delete")
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
    val rescanned = fullMinMaxAgg(
      base.join(broadcast(rescanKeys),
        col(keyCol) <=> rescanKeys("key"), "left_semi"),
      keyCol, valueExpr)
    kept.unionByName(rescanned)
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

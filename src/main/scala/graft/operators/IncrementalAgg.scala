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
  * discipline). MIN/MAX are NOT retractable from (n, total) state by
  * nature — they'd need per-group value sketches or the base scan;
  * AVG derives from (n, total); non-mergeable aggregates (exact
  * distinct) need the base scan by nature.
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
    val prior: Option[DataFrame] =
      try Some(DeltaReader.load(spark, mvPath)) catch { case _: Exception => None }
    val lastUpto = prior.map(_.select(max(col("__upto")))
      .head().getLong(0)).getOrElse(-1L)
    if (lastUpto >= baseVersion) return lastUpto

    val delta = prior match {
      case None =>
        DeltaReader.loadAt(spark, basePath, baseVersion)
          .groupBy(col(keyCol).as("key"))
          .agg(count(lit(1)).as("n"), sum(expr(valueExpr)).as("total"))
      case Some(_) =>
        val sign = when(col("_change_type") === "insert", 1L)
          .otherwise(-1L)
        DeltaReader.loadChangeFeed(spark, basePath, lastUpto, baseVersion)
          .groupBy(col(keyCol).as("key"))
          .agg(sum(sign).as("n"),
            sum(sign * expr(valueExpr)).as("total"))
    }
    val merged = prior match {
      case None => delta
      case Some(mv) =>
        mv.select(col("key"), col("n"), col("total")).as("m")
          .join(delta.as("d"), col("m.key") === col("d.key"), "full_outer")
          .select(
            coalesce(col("m.key"), col("d.key")).as("key"),
            (coalesce(col("m.n"), lit(0L)) +
              coalesce(col("d.n"), lit(0L))).as("n"),
            (coalesce(col("m.total"), lit(0L)) +
              coalesce(col("d.total"), lit(0L))).as("total"))
    }
    DeltaWriter.overwrite(
      merged.filter(col("n") =!= 0L) // fully-retracted groups vanish
        .withColumn("__upto", lit(baseVersion)), mvPath)
    baseVersion
  }
}

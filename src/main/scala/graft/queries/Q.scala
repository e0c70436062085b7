package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One operator-coverage query: a Spark-side implementation plus (usually)
  * a DuckDB-dialect oracle the driver hash-compares against (SURVEY §5).
  *
  * Determinism contract (both sides must produce bit-identical values):
  *  - money doubles are 2-decimal with float noise (FIXTURES.md) → convert
  *    to integer cents via round(x*100)::bigint, aggregate exactly in
  *    integers, and only divide back to double at the very end. Integer →
  *    double conversion and double division are correctly rounded IEEE ops,
  *    identical across engines.
  *  - every query ends in a total ORDER BY (ties broken by a unique key),
  *    with explicit NULLS FIRST to match Spark's ASC default.
  *  - aggregate/computed columns are aliased identically on both sides
  *    (the driver sorts columns by name before hashing).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exact integer cents from a 2-decimal double column (Spark side).
    * DuckDB side: CAST(ROUND(x*100) AS BIGINT). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Final cents-sum → double units. */
  def unc(c: Column): Column = (c.cast("double") / 100.0)
}

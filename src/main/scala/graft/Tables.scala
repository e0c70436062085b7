package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver-generated parquet corpus
  * (/root/testdata/sf* — see TESTDATA.md / FIXTURES.md).
  *
  * The reference registers tables via `CREATE EXTERNAL TABLE … LOCATION …`
  * DDL (/root/reference/crates/cli/src/main.rs:54-67); here the equivalent
  * seam is a plain `spark.read.parquet` + temp view. Parquet footers carry
  * the schema, so registration is metadata-only and cheap; scans stay
  * columnar/vectorized and Catalyst prunes columns + pushes filters down.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table as a DataFrame.
    *
    * `events.ts` is parquet timestamp[ns], which Spark's reader rejects
    * outright ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos
    * (`nanosAsLong`) and integer-truncate to a microsecond timestamp —
    * exactly what DuckDB's ns→µs conversion does, so oracle comparisons
    * agree. Integer `DIV`, not `/`: true division would round-trip through
    * double and lose sub-µs bits on 1.7e18-scale nanos. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  // last corpus dir registered per session — registration costs ~0.7s
  // (10 parquet footer reads), so repeat calls for the same dir skip it
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every corpus table as a temp view (idempotent per dir) and
    * return the session, so `spark.sql` can reference them by name exactly
    * like the reference's registered external tables. */
  def register(spark: SparkSession, dir: String): SparkSession = {
    if (registered.get(spark) != dir) {
      all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }
    spark
  }

  /** SQL against the registered corpus — the `ADTContext::sql` seam
    * (/root/reference/crates/core/src/context.rs:93-105) in Spark form. */
  def sql(spark: SparkSession, dir: String, q: String): DataFrame =
    register(spark, dir).sql(q)
}

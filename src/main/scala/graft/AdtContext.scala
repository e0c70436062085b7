package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Ddl

/** The library seam mirroring `ADTContext::sql`
  * (/root/reference/crates/core/src/context.rs:85-105): one entry point
  * that accepts either our `CREATE EXTERNAL TABLE` DDL (intercepted, like
  * the reference intercepts `LogicalPlan::Ddl` to register object stores,
  * context.rs:85-91) or any Spark SQL statement.
  *
  * Direct-URL tables (`enable_url_table`, context.rs:55) need no shim:
  * Spark natively supports ``SELECT * FROM parquet.`/path` ``.
  */
final class AdtContext(val spark: SparkSession) {

  /** DDL registers the table and yields an empty relation (the reference
    * prints an empty batch for DDL, main.rs:23-28); statements touching
    * `information_schema.*` are rewritten onto catalog-backed temp views
    * (context.rs:27 parity); everything else is Spark SQL. */
  def sql(statement: String): DataFrame =
    if (Ddl.matches(statement)) {
      Ddl.register(spark, Ddl.parse(statement))
      spark.emptyDataFrame
    } else if (AdtContext.InfoSchemaRef.findFirstIn(statement).isDefined) {
      InformationSchema.refresh(spark)
      spark.sql(AdtContext.InfoSchemaRef.replaceAllIn(statement,
        m => s"information_schema_${m.group(1).toLowerCase}"))
    } else spark.sql(statement)
}

object AdtContext {

  private[graft] val InfoSchemaRef =
    "(?i)information_schema\\.(tables|columns)".r

  /** Session defaults matching SURVEY §4.3's config-parity table. */
  def build(master: String = "local[*]"): AdtContext = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("adtspark")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new AdtContext(spark)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** `information_schema.{tables,columns}` shim (the reference enables
  * DataFusion's information_schema in its session config,
  * /root/reference/crates/core/src/context.rs:27).
  *
  * Spark has no information_schema catalog, so [[AdtContext.sql]]
  * rewrites `information_schema.tables|columns` references to temp views
  * refreshed here from `spark.catalog`. Catalog metadata is inherently
  * driver-side and tiny (one row per table/column), so local construction
  * is the correct shape at any scale.
  */
object InformationSchema {

  val TablesView = "information_schema_tables"
  val ColumnsView = "information_schema_columns"

  /** (Re)build both views from the current catalog state. */
  def refresh(spark: SparkSession): Unit = {
    import spark.implicits._
    val tables = spark.catalog.listTables().collect().toSeq
    tables
      .map(t => ("spark_catalog", Option(t.database).getOrElse("default"),
        t.name, t.tableType))
      .toDF("table_catalog", "table_schema", "table_name", "table_type")
      .createOrReplaceTempView(TablesView)
    tables
      .flatMap { t =>
        spark.catalog.listColumns(t.name).collect().zipWithIndex.map {
          case (c, i) =>
            ("spark_catalog", Option(t.database).getOrElse("default"), t.name,
              c.name, i + 1, c.dataType, c.nullable)
        }
      }
      .toDF("table_catalog", "table_schema", "table_name", "column_name",
        "ordinal_position", "data_type", "is_nullable")
      .createOrReplaceTempView(ColumnsView)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Curation, Dedup, Events, Edge, Extensions, Funcs, Pipeline, Q, Relational, Sources, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is one entry in [[queries]]
  * (Spark side) with, where SQL-expressible, a DuckDB oracle in
  * [[oracleSql]]. Column names and value bits match exactly between the
  * two sides (see graft.queries.Q for the determinism contract).
  */
object SparkEntry {

  private def allDefs: Seq[Q] =
    Relational.defs ++ Funcs.defs ++ Dedup.defs ++ TextOps.defs ++ Sources.defs ++ Extensions.defs ++ Edge.defs ++ Pipeline.defs ++ Curation.defs ++ Events.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3 flavor: fact⋈fact join + broadcast dim + agg + top-k. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    import spark.implicits._
    val l = Tables.t(spark, d, "lineitem")
    val o = Tables.t(spark, d, "orders")
    val c = Tables.t(spark, d, "customer")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        (sum(Q.cents($"l_extendedprice") * (lit(100L) - Q.cents($"l_discount")))
          .cast("double") / 10000.0).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy($"revenue".desc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Cost-based optimization: ANALYZE TABLE statistics must reach the
  * optimizer, and stats-driven join reorder must rewrite a badly
  * written multi-way join — the cluster-scale behavior (DataFusion
  * exposes no CBO; Spark's is the scale story for 100 TB star joins
  * whose WRITTEN order pairs two facts first).
  *
  * The spec materializes catalog tables (CTAS under /tmp), ANALYZEs
  * them with column stats, and asserts (a) rowCount statistics are
  * visible on the relations, (b) with CBO + joinReorder on, the
  * deepest join of lineitem ⋈ orders ⋈ (selective customer filter)
  * pairs orders with customer — NOT the written fact ⋈ fact order —
  * so the expensive join runs over the reduced intermediate. */
class CboSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  private def leafTables(p: LogicalPlan): Set[String] =
    p.collectLeaves().flatMap(_.toString.linesIterator.take(1)).toSet

  test("ANALYZE TABLE stats drive join reorder under CBO") {
    val loc = java.nio.file.Files.createTempDirectory("cbo").toString
    for (t <- Seq("lineitem", "orders", "customer")) {
      spark.sql(s"DROP TABLE IF EXISTS ${t}_cbo")
      Tables.t(spark, d, t).write.mode("overwrite")
        .option("path", s"$loc/$t").saveAsTable(s"${t}_cbo")
      spark.sql(s"ANALYZE TABLE ${t}_cbo COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    try {
      SparkTestSession.withConfs(Seq(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true",
        "spark.sql.cbo.planStats.enabled" -> "true",
        "spark.sql.statistics.histogram.enabled" -> "false")) {

        // (a) the catalog stats reach the optimizer
        val rel = spark.table("orders_cbo").queryExecution.optimizedPlan
        val rc = rel.stats.rowCount
        assert(rc.isDefined && rc.get > 0, "ANALYZE rowCount must be visible")

        // (b) written order joins the two facts first; the selective
        // customer filter should be re-ordered inward
        val q = spark.sql("""
          SELECT c_mktsegment, count(*) AS n
          FROM lineitem_cbo
          JOIN orders_cbo ON l_orderkey = o_orderkey
          JOIN customer_cbo ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY c_mktsegment""")
        val joins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
        assert(joins.size == 2, s"expected a 2-join tree, got ${joins.size}")
        // the DEEPEST join (no Join below it on either side)
        val deepest = joins.filter(j =>
          j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
        assert(deepest.size == 1)
        val leaves = leafTables(deepest.head)
        val hasLineitem = leaves.exists(_.contains("lineitem_cbo"))
        val hasOrders = leaves.exists(_.contains("orders_cbo"))
        val hasCustomer = leaves.exists(_.contains("customer_cbo"))
        assert(hasOrders && hasCustomer && !hasLineitem,
          s"CBO should pair orders with the filtered customer dim first; deepest join leaves: $leaves")
      }
    } finally {
      for (t <- Seq("lineitem", "orders", "customer"))
        spark.sql(s"DROP TABLE IF EXISTS ${t}_cbo")
      // DROP on path-based tables removes only catalog entries — delete
      // the CTAS data too, or each run leaves a corpus copy in /tmp
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(loc))
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketing = the co-located-join strategy SCALE.md claims for repeated
  * large⋈large joins: both sides bucketed by the join key join WITHOUT a
  * shuffle exchange. */
class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("bucketed fact-fact join plans without shuffle exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.t(spark, d, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.t(spark, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"))
      joined.collect() // finalize AQE plan

      def collectShuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
        p match {
          case a: AdaptiveSparkPlanExec => collectShuffles(a.executedPlan)
          case other => other.collect {
            case s: ShuffleExchangeExec => s
            case a: AdaptiveSparkPlanExec => return collectShuffles(a.executedPlan)
          }
        }
      val shuffles = collectShuffles(joined.queryExecution.executedPlan)
      // join consumes bucket layout directly; the only permissible shuffle
      // would be none at all (groupBy key == bucket key too)
      assert(shuffles.isEmpty,
        s"expected bucket-co-located join with no exchanges, got ${shuffles.length}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}

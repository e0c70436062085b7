package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.DistributedRank
import graft.queries.Q

/** DistributedRank must agree with Spark's own window row_number on
  * EVERY row — including keys whose runs span range-partition
  * boundaries. */
class DistributedRankSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("distributed row_number == window row_number on every row") {
    import spark.implicits._
    val base = Tables.t(spark, d, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
    val dist = DistributedRank.rowNumber(
      base, $"o_orderpriority",
      Seq(Q.cents($"o_totalprice").desc, $"o_orderkey".asc), "rn", 16)
      .select($"o_orderkey", $"rn")
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy(Q.cents($"o_totalprice").desc, $"o_orderkey".asc)
    val win = base.withColumn("rn_w", row_number().over(w).cast("long"))
      .select($"o_orderkey", $"rn_w")
    val diff = dist.join(win, "o_orderkey")
      .filter($"rn" =!= $"rn_w")
    assert(diff.count() == 0)
    assert(dist.count() == base.count())
  }

  test("distributed running sum == window running sum on every row") {
    import spark.implicits._
    val base = Tables.t(spark, d, "documents")
      .select($"doc_id", $"lang", size(split($"text", " ")).cast("long").as("n_tok"))
    val dist = DistributedRank.runningSum(
      base, $"lang", Seq($"doc_id"), $"n_tok", "run", 16)
      .select($"doc_id", $"run")
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
    val win = base.withColumn("run_w", sum($"n_tok").over(w))
      .select($"doc_id", $"run_w")
    val diff = dist.join(win, "doc_id").filter($"run" =!= $"run_w")
    assert(diff.count() == 0)
    assert(dist.count() == base.count())
  }

  test("running sum spreads a key's rows across range partitions (no serial per-key task)") {
    import spark.implicits._
    val base = Tables.t(spark, d, "documents")
      .select($"doc_id", $"lang", size(split($"text", " ")).cast("long").as("n_tok"))
    val nLangs = base.select($"lang").distinct().count()
    val out = DistributedRank.runningSum(
      base, $"lang", Seq($"doc_id"), $"n_tok", "run", 16)
      .withColumn("pid", spark_partition_id())
    // more busy partitions than keys, and at least one key spanning >1
    // partition — the window spelling would pin exactly one task per key
    assert(out.select($"pid").distinct().count() > nLangs)
    val maxSpread = out.groupBy($"lang")
      .agg(countDistinct($"pid").as("np"))
      .agg(max($"np")).first().getLong(0)
    assert(maxSpread > 1)
  }

  test("randomized shapes: both primitives match the window spellings exactly") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(300)
      val nKeys = 1 + rnd.nextInt(8) // includes the single-key worst case
      val rows = (0 until n).map { i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}", rnd.nextInt(1000).toLong)
      }
      val df = rows.toDF("id", "k", "v").repartition(7)
      val nParts = 1 + rnd.nextInt(20)
      val w = Window.partitionBy($"k").orderBy($"id")
      val expect = df
        .withColumn("run_w", sum($"v").over(w))
        .withColumn("rn_w", row_number().over(w).cast("long"))
        .select($"id", $"run_w", $"rn_w")
      val gotSum = DistributedRank.runningSum(
        df, $"k", Seq($"id"), $"v", "run", nParts).select($"id", $"run")
      val gotRn = DistributedRank.rowNumber(
        df, $"k", Seq($"id"), "rn", nParts).select($"id", $"rn")
      val bad = expect.join(gotSum, "id").join(gotRn, "id")
        .filter($"run" =!= $"run_w" || $"rn" =!= $"rn_w")
      assert(bad.count() == 0, s"seed=$seed n=$n keys=$nKeys parts=$nParts")
      assert(gotSum.count() == n.toLong)
    }
  }

  test("more partitions than rows of a key still numbers correctly") {
    import spark.implicits._
    val tiny = Seq((1L, "a", 3.0), (2L, "a", 2.0), (3L, "b", 1.0))
      .toDF("k", "p", "v")
    val out = DistributedRank.rowNumber(
      tiny, $"p", Seq($"v".desc, $"k".asc), "rn", 8)
      .select($"k", $"rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}

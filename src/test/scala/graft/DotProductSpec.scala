package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DotProductI64
import graft.functions.DotProductI64.dot_i64

/** Native Catalyst expression: interpreted eval, codegen path, SQL
  * registration, and null/type behavior. */
class DotProductSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("column API computes the integer dot product") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
    assert(df.select(dot_i64($"a", $"b")).head.getLong(0) == 32L)
  }

  test("SQL registration + codegen over many rows") {
    DotProductI64.register(spark)
    val n = spark.range(1000)
      .selectExpr("sequence(1, 16) as a", "sequence(1, 16) as b")
      .selectExpr("dot_i64(CAST(a AS ARRAY<BIGINT>), CAST(b AS ARRAY<BIGINT>)) AS d")
      .where("d = 1496") // sum of squares 1..16
      .count()
    assert(n == 1000L)
  }

  test("null input propagates null") {
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(dot_i64($"a", $"b")).head.isNullAt(0))
  }

  test("type mismatch fails analysis") {
    val df = Seq(("x", Seq(1L))).toDF("a", "b")
    val e = intercept[Exception] { df.select(dot_i64($"a", $"b")).head }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"))
  }

  test("matches the lambda formulation on real embeddings") {
    val emb = Tables.t(spark, SparkTestSession.sfDir, "embeddings")
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))").as("v"))
      .limit(50)
    val both = emb.select(
      dot_i64($"v", $"v").as("native"),
      expr("aggregate(transform(v, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
        .as("lambda"))
    assert(both.where($"native" =!= $"lambda").count() == 0)
  }
}

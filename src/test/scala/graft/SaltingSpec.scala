package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Skew mitigation (SCALE.md): two-phase salted aggregation produces the
  * same result as direct aggregation while splitting a hot key across
  * `SALT` reducers. The pattern every skewed groupBy at 100 TB uses when
  * AQE's runtime skew handling isn't enough. */
class SaltingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation") {
    // skewed input: 90% of rows share one key
    val df = spark.range(100000)
      .select(
        when($"id" % 10 < 9, lit("hot")).otherwise(concat(lit("k"), $"id" % 7))
          .as("k"),
        ($"id" % 1000).as("v"))

    val direct = df.groupBy($"k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val SALT = 16
    val salted = df
      .withColumn("salt", pmod(hash($"v"), lit(SALT)))
      .groupBy($"k", $"salt") // phase 1: hot key spreads over SALT groups
      .agg(sum($"v").as("ps"), count(lit(1)).as("pn"))
      .groupBy($"k") // phase 2: merge partials
      .agg(sum($"ps").as("s"), sum($"pn").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    assert(salted == direct)
    assert(direct.exists(_._1 == "hot"))
  }
}

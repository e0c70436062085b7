package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must execute and (except known-empty shapes)
  * return rows at sf0.001. The value-level gate is the external DuckDB
  * oracle (scripts/check_oracle.py); this suite guards execution and
  * schema sanity inside the JVM. */
class QueriesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("entry flagship runs with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // Sketch/near-dup pair queries can legitimately be empty at the tiny SF.
  private val mayBeEmpty = Set(
    "q41_dedup_ngram_jaccard", "q42_dedup_minhash_lsh", "q43_dedup_simhash",
    "q67_dedup_embedding")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, d)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}

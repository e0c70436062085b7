package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** `spark.sql.extensions=graft.GraftExtensions` must make the custom
  * Catalyst surface resolve in a session this library did not build. */
class ExtensionsSpec extends AnyFunSuite {

  test("dot_i64 resolves via injected extensions in a fresh session") {
    val orig = SparkTestSession.spark // keeps the shared SparkContext alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // programmatic route; `spark.sql.extensions=graft.GraftExtensions`
      // is the config equivalent (a static conf, so it must be set when
      // the SparkContext starts — this JVM's test context predates it)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val d = s2.sql("SELECT dot_i64(array(1L, 2L), array(3L, 4L)) AS d")
        .collect()(0).getLong(0)
      assert(d == 11L)

      // injected resolution rule: information_schema resolves in plain
      // spark.sql with no AdtContext wrapper
      s2.range(3).createOrReplaceTempView("ext_probe_table")
      val names = s2.sql(
        "SELECT table_name FROM information_schema.tables")
        .collect().map(_.getString(0)).toSet
      assert(names.contains("ext_probe_table"))
      val cols = s2.sql("""
        SELECT column_name FROM information_schema.columns
        WHERE table_name = 'ext_probe_table'""")
        .collect().map(_.getString(0)).toSet
      assert(cols == Set("id"))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}

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

      // md5_60 injects too, and equals the composable hex spelling
      val pair = s2.sql(
        """SELECT md5_60('shingle one'),
                  CAST(conv(substr(md5('shingle one'), 2, 15), 16, 10) AS BIGINT)""")
        .collect()(0)
      assert(pair.getLong(0) == pair.getLong(1))

      // dhash63 injects too, and equals the JVM kernel on the same bytes
      val dh = s2.sql("SELECT dhash63(encode('abcdefgh', 'UTF-8')) AS h")
        .collect()(0).getLong(0)
      assert(dh ==
        graft.operators.Multimodal.dHash("abcdefgh".getBytes("UTF-8")))

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

      // information_schema.views: Dataset-registered views appear with a
      // NULL definition; SQL-created views carry their defining text
      // (DataFusion exposes the same four-view schema, context.rs:27)
      s2.sql("CREATE OR REPLACE TEMP VIEW ext_probe_sql_view AS " +
        "SELECT id * 2 AS dbl FROM ext_probe_table")
      val views = s2.sql("""
        SELECT table_name, definition FROM information_schema.views
        WHERE table_name LIKE 'ext_probe%'""")
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(views.keySet == Set("ext_probe_table", "ext_probe_sql_view"))
      assert(views("ext_probe_table").isEmpty)
      assert(views("ext_probe_sql_view").exists(_.contains("id * 2")))

      // GLOBAL temp views surface too (they live only under the
      // global_temp database, which listTables() alone never reports),
      // with their defining SQL from the global registry
      s2.sql("CREATE OR REPLACE GLOBAL TEMP VIEW ext_probe_global AS " +
        "SELECT id + 5 AS shifted FROM ext_probe_table")
      val gv = s2.sql("""
        SELECT table_schema, definition FROM information_schema.views
        WHERE table_name = 'ext_probe_global'""").collect()
      assert(gv.length == 1)
      assert(gv(0).getString(0) == "global_temp")
      assert(Option(gv(0).getString(1)).exists(_.contains("id + 5")))
      val gcols = s2.sql("""
        SELECT column_name FROM information_schema.columns
        WHERE table_name = 'ext_probe_global'""")
        .collect().map(_.getString(0)).toSet
      assert(gcols == Set("shifted"))

      // information_schema.df_settings: (name, value) over the session's
      // documented conf surface, current values not defaults
      s2.conf.set("spark.sql.shuffle.partitions", "7")
      val shuffle = s2.sql("""
        SELECT value FROM information_schema.df_settings
        WHERE name = 'spark.sql.shuffle.partitions'""")
        .collect().map(_.getString(0)).toSeq
      assert(shuffle == Seq("7"))

      // schemata lists the default database; routines lists registered
      // functions (builtin + all three injected native expressions)
      val schemas = s2.sql(
        "SELECT schema_name FROM information_schema.schemata")
        .collect().map(_.getString(0)).toSet
      assert(schemas.contains("default"))
      val fns = s2.sql("""
        SELECT routine_name FROM information_schema.routines
        WHERE routine_name IN ('abs', 'dot_i64', 'md5_60', 'dhash63')""")
        .collect().map(_.getString(0)).toSet
      assert(fns == Set("abs", "dot_i64", "md5_60", "dhash63"))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}

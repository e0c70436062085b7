package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Golden `execute` flow: a multi-statement .sql file through the exact
  * splitter + AdtContext + formatter pipeline the CLI uses (FIXTURES.md
  * item 5). */
class GoldenExecSpec extends AnyFunSuite {

  test("golden1.sql runs through the execute pipeline with stable output") {
    val url = getClass.getResource("/queries/golden1.sql")
    assert(url != null, "golden1.sql resource missing")
    val lines = Files.readAllLines(
      Paths.get(url.toURI), StandardCharsets.UTF_8).asScala.toSeq

    val stmts = Cli.splitStatements(lines)
    assert(stmts.length == 4) // 2 DDL + 2 queries; trailing stmt without ';'
    assert(stmts.last == "SELECT 'a;b' AS s, 1 + 1 AS two")

    val ctx = new AdtContext(SparkTestSession.spark)
    val outputs = stmts.map(stmt => Output.format(ctx.sql(stmt)))
    // DDL → empty boxes
    assert(outputs(0) == "++\n++")
    assert(outputs(1) == "++\n++")
    // join result: 5 regions × 5 nations each
    assert(outputs(2).contains("AFRICA") && outputs(2).contains("| 5"))
    // mid-line semicolon survived the splitter
    assert(outputs(3).contains("a;b"))
  }

  test("golden2.sql: information_schema + EXPLAIN ANALYZE through the execute pipeline") {
    val url = getClass.getResource("/queries/golden2.sql")
    assert(url != null, "golden2.sql resource missing")
    val lines = Files.readAllLines(
      Paths.get(url.toURI), StandardCharsets.UTF_8).asScala.toSeq
    val stmts = Cli.splitStatements(lines)
    assert(stmts.length == 5) // 1 DDL + 3 introspections + EXPLAIN ANALYZE
    val ctx = new AdtContext(SparkTestSession.spark)
    val outputs = stmts.map(stmt => Output.format(ctx.sql(stmt)))
    assert(outputs(0) == "++\n++")
    assert(outputs(1).contains("g2nat"))
    assert(outputs(2).contains("| 3")) // nation: key, name, regionkey
    assert(outputs(3).contains("UTC"))
    assert(outputs(4).contains("Plan with Metrics") &&
      outputs(4).contains("metrics=["))
  }
}

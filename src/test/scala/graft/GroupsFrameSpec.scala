package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the GROUPS-frame emulation (q78) against hand-computed GROUPS
  * semantics: the frame of a row spans all PEER GROUPS within the rank
  * band, not physical rows. Neither Spark nor DuckDB 1.0 implements
  * GROUPS natively, so the vector below is the ground truth. */
class GroupsFrameSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("dense_rank band-join reproduces GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING") {
    // one partition, values with ties: 1,1,2,5,5,5,9
    // GROUPS frames (±1 group):
    //   v=1 → groups {1,2}   sum=4,  n=3
    //   v=2 → groups {1,2,5} sum=19, n=6
    //   v=5 → groups {2,5,9} sum=26, n=5
    //   v=9 → groups {5,9}   sum=24, n=4
    // rows carry a unique id (as in q78's (suppkey, orderkey, linenumber))
    val df = Seq(1L, 1L, 2L, 5L, 5L, 5L, 9L).zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("id", "q")
    df.createOrReplaceTempView("gf_in")
    val out = spark.sql("""
      WITH r AS (SELECT id, q, dense_rank() OVER (ORDER BY q) AS dr FROM gf_in),
      g AS (SELECT dr, sum(q) AS sq, count(*) AS c FROM r GROUP BY dr)
      SELECT r.id, r.q,
        CAST(sum(g.sq) AS BIGINT) AS gs, CAST(sum(g.c) AS BIGINT) AS gn
      FROM r JOIN g ON g.dr BETWEEN r.dr - 1 AND r.dr + 1
      GROUP BY r.id, r.q, r.dr
      ORDER BY r.id""").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // per-value frame: distinct (q → sum, n) must match the hand computation
    assert(out.toSet == Set((1L, 4L, 3L), (2L, 19L, 6L), (5L, 26L, 5L), (9L, 24L, 4L)))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** q154's Z-order layout: the Column spelling must equal the plain-JVM
  * Morton reference bit-for-bit, and the layout must actually buy the
  * thing it claims — tighter per-bucket min/max envelopes in BOTH dims
  * than the layouts it replaces, measured as bucket-level stats pruning
  * (the file-skipping a DeltaStats-style reader performs). */
class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("Column morton == JVM morton on random 16-bit pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", ZOrder.morton($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == ZOrder.mortonLong(x, y), s"mismatch at ($x,$y)")
    }
  }

  test("3-D morton: Column == JVM on random 8-bit triples; bits land every third position") {
    val rnd = new scala.util.Random(43)
    val triples = Seq.fill(300)(
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
        rnd.nextInt(256).toLong))
    val got = triples.toDF("x", "y", "z")
      .select($"x", $"y", $"z", ZOrder.morton3($"x", $"y", $"z").as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    triples.foreach { case (x, y, z) =>
      assert(got((x, y, z)) == ZOrder.morton3Long(x, y, z))
    }
    // bit-interleave ground truth: bit i of x lands at 3i, y at 3i+1,
    // z at 3i+2
    for (i <- 0 until 8) {
      assert(ZOrder.morton3Long(1L << i, 0, 0) == (1L << (3 * i)))
      assert(ZOrder.morton3Long(0, 1L << i, 0) == (1L << (3 * i + 1)))
      assert(ZOrder.morton3Long(0, 0, 1L << i) == (1L << (3 * i + 2)))
    }
  }

  test("morton interleave is monotone in each dim at fixed other dim") {
    // not a sort order, but each dim's order is preserved on its own
    // bit positions — the property that makes per-bucket min/max tight
    for (y <- Seq(0L, 7L, 255L); x <- 0L until 255L)
      assert(ZOrder.mortonLong(x, y) < ZOrder.mortonLong(x + 1, y))
    for (x <- Seq(0L, 7L, 255L); y <- 0L until 255L)
      assert(ZOrder.mortonLong(x, y) < ZOrder.mortonLong(x, y + 1))
  }

  /** Per-bucket (min,max) envelopes of both dims under a layout that
    * buckets rows by equal-count ranks of `key`. */
  private def envelopes(key: String): Array[(Long, Long, Long, Long)] = {
    val raw = Tables.t(spark, SparkTestSession.sfDir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
    val mx = raw.agg(max($"l_partkey"), max($"l_suppkey"), count(lit(1))).head()
    val (mp, ms, nt) = (mx.getLong(0), mx.getLong(1), mx.getLong(2))
    val keyed = raw.withColumn("zk", key match {
      case "z" => ZOrder.morton(
        expr(s"l_partkey * 256 DIV ${mp + 1}"),
        expr(s"l_suppkey * 256 DIV ${ms + 1}"))
      case c => col(c).cast("long")
    })
    keyed
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"zk", $"l_orderkey", $"l_linenumber",
            $"l_partkey", $"l_suppkey")).cast("long"))
      .select(expr(s"CAST((rk - 1) * 16 DIV $nt AS BIGINT)").as("bucket"),
        $"l_partkey", $"l_suppkey")
      .groupBy($"bucket")
      .agg(min($"l_partkey").as("p0"), max($"l_partkey").as("p1"),
        min($"l_suppkey").as("s0"), max($"l_suppkey").as("s1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  /** Buckets a reader must SCAN for a [lo,hi] predicate on one dim,
    * given that layout's bucket stats (the DeltaStats.mayMatch rule:
    * keep iff [min,max] overlaps [lo,hi]). */
  private def scanned(env: Array[(Long, Long, Long, Long)],
      dim: String, lo: Long, hi: Long): Int =
    env.count { case (p0, p1, s0, s1) =>
      val (a, b) = if (dim == "p") (p0, p1) else (s0, s1)
      a <= hi && b >= lo
    }

  test("z layout stats-prunes BOTH dims; single-key sort prunes only its own") {
    val z = envelopes("z")
    val byPart = envelopes("l_partkey")   // single-dim clustered layout
    val natural = envelopes("l_orderkey") // insertion-order layout
    // a 20%-selectivity central band on each dim, derived from the SF
    val mx = Tables.t(spark, SparkTestSession.sfDir, "lineitem")
      .agg(max($"l_partkey"), max($"l_suppkey")).head()
    val (mp, ms) = (mx.getLong(0), mx.getLong(1))
    val (pLo, pHi) = (mp * 2 / 10, mp * 4 / 10)
    val (sLo, sHi) = (ms * 2 / 10, ms * 4 / 10)
    // natural layout: every bucket spans ~the full range of both dims —
    // stats prune nothing on either
    assert(scanned(natural, "p", pLo, pHi) == natural.length)
    assert(scanned(natural, "s", sLo, sHi) == natural.length)
    // partkey-sorted layout: prunes partkey predicates hard, suppkey not at all
    assert(scanned(byPart, "p", pLo, pHi) < byPart.length / 2)
    assert(scanned(byPart, "s", sLo, sHi) == byPart.length)
    // z layout: prunes BOTH — strictly beats natural on each dim and
    // beats the single-key layout on the dim that layout ignores
    assert(scanned(z, "p", pLo, pHi) < z.length)
    assert(scanned(z, "s", sLo, sHi) < z.length)
    assert(scanned(z, "s", sLo, sHi) < scanned(byPart, "s", sLo, sHi))
  }
}

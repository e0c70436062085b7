package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the dedup/similarity operators at sf0.01 (the
  * scale where near-duplicates are planted in the corpus). */
class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.01"

  test("exact dedup finds exactly the 100 planted duplicates") {
    val out = SparkEntry.queries("q40_dedup_exact")(spark, d).collect()
    assert(out.length == 100)
    assert(out.forall(_.getAs[Long]("n_copies") == 2L))
  }

  test("minhash-LSH recalls every exact-jaccard near-dup pair") {
    val exact = SparkEntry.queries("q41_dedup_ngram_jaccard")(spark, d)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q42_dedup_minhash_lsh")(spark, d)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no planted near-dups found by exact jaccard")
    assert(exact == lsh, s"LSH missed: ${exact -- lsh}; extra: ${lsh -- exact}")
  }

  test("minhash similarity estimate is high for near-dup pairs") {
    val rows = SparkEntry.queries("q42_dedup_minhash_lsh")(spark, d).collect()
    assert(rows.forall(_.getAs[Double]("est_sim") >= 0.5))
  }

  test("topk neighbors are self-free, k-bounded and ordered") {
    val rows = SparkEntry.queries("q44_sim_topk_bruteforce")(spark, d).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(rs.forall(_.getAs[Long]("neighbor") != q))
      val cos = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("approx_count_distinct within 10% of exact") {
    // q53 now emits normalized error-bound booleans (oracle-checkable);
    // the 5% HLL bound subsumes the old 10% raw check.
    val rows = SparkEntry.queries("q53_approx_sketches")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("cd_within_5pct"), s"row $r")
      assert(r.getAs[Boolean]("median_in_range"), s"row $r")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** q162 PageRank: the distributed fixed-round kernel must equal a
  * plain-Scala reference run over the same symmetrized pair graph —
  * every node's rank, not just the top-k the query emits. The reference
  * recomputes the integer update (floor share per neighbour, 85/100
  * damping with floor) from an in-memory adjacency list, so any drift
  * in the distributed spelling — degree fold, share division, the
  * damping arithmetic — fails here before the oracle gate. */
class PageRankSpec extends AnyFunSuite {

  test("q162 kernel == plain-Scala reference PageRank on the dhash graph") {
    val s = SparkTestSession.spark
    import s.implicits._
    val d = SparkTestSession.sfDir

    val pairs = graft.queries.TextOps
      .dhashPairs(s, d)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus must yield near-dup pairs")

    // reference: adjacency over the symmetrized graph, 3 integer rounds
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSeq }
    val deg = adj.map { case (u, ns) => u -> ns.length.toLong }
    var pr: Map[Long, Long] = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to graft.queries.TextOps.PageRankRounds) {
      pr = adj.keys.map { v =>
        // Σ over in-neighbours = Σ over neighbours (symmetric graph)
        val m = adj(v).iterator.map(u => pr(u) / deg(u)).sum
        v -> (150000L + (85L * m) / 100L)
      }.toMap
    }

    val got = graft.operators.PageRank
      .rounds(graft.queries.TextOps.dhashEdges(s, d),
        graft.queries.TextOps.PageRankRounds)
      .select($"doc_id", $"deg", $"pr").as[(Long, Long, Long)]
      .collect()

    assert(got.map(r => r._1 -> r._2).toMap === deg)
    assert(got.map(r => r._1 -> r._3).toMap === pr)
    // mass sanity: ranks stay positive and bounded by the total initial
    // mass (floor division only ever drops mass)
    assert(got.forall { case (_, _, p) => p >= 150000L })
  }
}

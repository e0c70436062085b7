package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q148 BPE training: the distributed trainer must equal a driver-side
  * reference implementation run over the same word-frequency table —
  * the merge table row-for-row, and (the round-consistency contract)
  * every round r+1's pair counts must reflect round r's merge exactly.
  * The wrapped-replace merge kernel itself is property-checked against
  * the greedy list-fold reference in PropertySpec. */
class BpeSpec extends AnyFunSuite {

  /** Reference greedy left-to-right BPE merge over a symbol list: a
    * freshly merged token does not re-participate in the same round. */
  private def greedyMerge(
      syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def pairCounts(
      ss: Seq[(Vector[String], Long)]): Map[(String, String), Long] =
    ss.iterator
      .flatMap { case (v, c) => v.zip(v.tail).map(p => p -> c) }
      .toSeq.groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).sum }

  test("q148 == reference trainer; round r+1 pair counts reflect round r's merge") {
    val s = SparkTestSession.spark
    import s.implicits._
    val d = SparkTestSession.sfDir

    // the reference trainer's input: the same word-frequency table
    val words: Seq[(String, Long)] = Tables.t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().toSeq
    var segs: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }

    // Spark-side evolving segmentation (the q148 replace chain)
    var segDf = s.createDataset(words).toDF("w", "cnt")
      .select($"cnt", regexp_replace($"w", "(.)", "~$1~").as("seg"))

    val refMerges =
      scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    (1 to graft.queries.TextOps.BpeRounds).foreach { r =>
      // round-consistency: the distributed pair counts over the current
      // segmentation (i.e. AFTER round r-1's merge) must equal the
      // reference counts over the list segmentations
      val sparkCounts = graft.queries.TextOps.bpePairCounts(segDf)
        .as[(String, String, Long)].collect()
        .map { case (l, rr, n) => (l, rr) -> n }.toMap
      assert(sparkCounts == pairCounts(segs), s"pair counts diverged at round $r")

      val ((l, rr), n) = pairCounts(segs).toSeq
        .sortBy { case ((pl, pr), pn) => (-pn, pl, pr) }.head
      refMerges += ((r, l, rr, n))
      segs = segs.map { case (v, c) => (greedyMerge(v, l, rr), c) }
      segDf = segDf.select($"cnt",
        replace($"seg", lit(s"~$l~~$rr~"), lit(s"~$l$rr~")).as("seg"))
    }

    // the shipped query must produce exactly the reference merge table
    val got = SparkEntry.queries("q148_bpe_train")(s, d)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == refMerges.toSeq)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, OpenSession, Session}

class SessionizeSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val d = SparkTestSession.sfDir

  test("fold kernel: gap splitting, carry-in state, open tail") {
    val ev = Seq(Event(1, 100, 5), Event(1, 200, 5), Event(1, 5000, 10))
    val (closed, open) = Sessionize.fold(1L, None, ev, gapSeconds = 1800)
    assert(closed == Seq(Session(1, 100, 200, 2, 10)))
    assert(open.contains(OpenSession(5000, 5000, 1, 10)))
    // carry-in merges when the gap is small
    val (c2, o2) = Sessionize.fold(1L, Some(OpenSession(4000, 4400, 2, 7)),
      Seq(Event(1, 4500, 3)), 1800)
    assert(c2.isEmpty && o2.contains(OpenSession(4000, 4500, 3, 10)))
    // a LATE cross-batch event (epoch behind the carried frontier) is
    // absorbed with clamped bounds — the frontier must never regress,
    // or the next on-time event could close a session with end < start
    val (c3, o3) = Sessionize.fold(1L, Some(OpenSession(4000, 4400, 2, 7)),
      Seq(Event(1, 3900, 2), Event(1, 4600, 1)), 1800)
    assert(c3.isEmpty && o3.contains(OpenSession(3900, 4600, 4, 10)))
    // late event BEFORE the carried start: start clamps down to it
    val (c4, o4) = Sessionize.fold(1L, Some(OpenSession(4000, 4400, 2, 7)),
      Seq(Event(1, 2800, 2)), 1800)
    assert(c4.isEmpty && o4.contains(OpenSession(2800, 4400, 3, 9)))
  }

  test("streamed closed sessions == batch sessions minus open tails") {
    val streamed = Sessionize.runStream(spark, d, queryName = "sess_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    val batchAll = Sessionize.runBatch(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // open tail per user = the session with the max start_s
    val openTails = batchAll.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    val expectedClosed = batchAll.toSet -- openTails

    assert(streamed == expectedClosed)
    assert(streamed.nonEmpty)
  }
}

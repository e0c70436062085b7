package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {

  test("decodeStub is deterministic and shape-correct") {
    val bytes = "hello world".getBytes("UTF-8")
    val a = Multimodal.decodeStub(7L, bytes)
    val b = Multimodal.decodeStub(7L, bytes)
    assert(a == b)
    assert(a.n_bytes == 11)
    assert(a.magic == "68656C6C") // 'hell'
    assert(a.fake_width == 11 && a.fake_height == 77)
  }

  test("partition decode preserves cardinality and order within partition") {
    val in = (0L until 100L).map(i => (i, s"payload-$i".getBytes("UTF-8")))
    val out = Multimodal.decodePartition(in.iterator).toSeq
    assert(out.length == 100)
    assert(out.map(_.doc_id) == (0L until 100L))
  }

  test("multimodal query plumbs binary through mapPartitions") {
    val df = SparkEntry.queries("q50_multimodal_meta")(
      SparkTestSession.spark, SparkTestSession.sfDir)
    assert(df.columns.toSeq ==
      Seq("doc_id", "n_bytes", "magic", "fake_width", "fake_height"))
    assert(df.count() > 0)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Option parsing of the graft-delta streaming source. Lives in package
  * graft.sources to reach the private[sources] parser. */
class GraftDeltaSourceSpec extends AnyFunSuite {
  private val src = new GraftDeltaSource()

  test("maxBytesPerTrigger spellings: plain, k/m/g, kb/mb/gb, whitespace") {
    assert(src.parseBytes("1024") == 1024L)
    assert(src.parseBytes("10k") == 10L * 1024)
    assert(src.parseBytes("10kb") == 10L * 1024)
    assert(src.parseBytes("2m") == 2L * 1024 * 1024)
    assert(src.parseBytes("2MB") == 2L * 1024 * 1024)
    assert(src.parseBytes("1g") == 1L << 30)
    assert(src.parseBytes(" 3 gb ") == 3L * (1L << 30))
    assert(src.parseBytes("7b") == 7L)
  }

  test("maxBytesPerTrigger refusals are descriptive: junk, zero, overflow") {
    // every malformed spelling gets the friendly error, never a raw
    // NumberFormatException
    for (bad <- Seq("", "kb", "10x", "1.5m", "-1", "10 k b", "g10"))
      assert(intercept[IllegalArgumentException] {
        src.parseBytes(bad)
      }.getMessage.contains("maxBytesPerTrigger"), s"input: '$bad'")
    // zero refuses as non-positive
    assert(intercept[IllegalArgumentException] {
      src.parseBytes("0")
    }.getMessage.contains("positive"))
    // a product past Long.MaxValue refuses instead of wrapping negative
    assert(intercept[IllegalArgumentException] {
      src.parseBytes("99999999999999999999g")
    }.getMessage.contains("maxBytesPerTrigger"))
    assert(intercept[IllegalArgumentException] {
      src.parseBytes(s"${Long.MaxValue}g")
    }.getMessage.contains("overflows"))
  }
}

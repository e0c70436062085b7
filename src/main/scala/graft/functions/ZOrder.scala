package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, shiftleft}

/** Z-order (Morton) interleave for multi-dimensional data clustering —
  * the write-path layout operator behind q154. Reference engines expose
  * this as `OPTIMIZE … ZORDER BY` (Delta) / `ALTER TABLE … CLUSTER BY`;
  * Spark has no built-in, so the curve key is hand-built from the
  * classic parallel-prefix bit-spreading (4 shift-mask steps per dim —
  * pure integer ops, codegen-friendly, bit-identical in any engine).
  *
  * Both dims are first normalized to a shared 8-bit grid using
  * corpus-derived maxima: interleaving mismatched bit-widths (an 11-bit
  * key against a 7-bit key) lets the wide dim's high bits dominate and
  * the narrow dim decluster — measured on the corpus, normalization
  * takes the narrow dim's per-bucket span from ~96% of its range to
  * ~20% while the wide dim stays ~32% (ZOrderSpec pins the comparison).
  *
  * The THREE spellings (Column, DuckDB SQL, plain JVM) are generated
  * from one shift-mask constant table so they cannot drift; ZOrderSpec
  * proves Column == JVM on random inputs and the q154 oracle proves
  * Column == DuckDB corpus-wide.
  */
object ZOrder {

  /** (shift, mask) steps spreading a 16-bit value's bits to even
    * positions of a 32-bit value (classic magic-number spreading). */
  private val Steps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Column spelling: spread a non-negative <=16-bit long column. */
  def spread(c: Column): Column =
    Steps.foldLeft(c) { case (e, (s, m)) =>
      (e.bitwiseOR(shiftleft(e, s))).bitwiseAND(lit(m))
    }

  /** Column spelling: 2-dim Morton key (x even bits, y odd bits). */
  def morton(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** DuckDB-dialect SQL spelling of [[spread]] (same constants). */
  def spreadDuck(e: String): String =
    Steps.foldLeft(e) { case (x, (s, m)) => s"((($x) | (($x) << $s)) & $m)" }

  /** DuckDB-dialect SQL spelling of [[morton]]. */
  def mortonDuck(x: String, y: String): String =
    s"(${spreadDuck(x)} | (${spreadDuck(y)} << 1))"

  /** Plain-JVM reference spelling (ZOrderSpec's ground truth). */
  def mortonLong(x: Long, y: Long): Long = {
    def sp(v: Long): Long =
      Steps.foldLeft(v) { case (e, (s, m)) => (e | (e << s)) & m }
    sp(x) | (sp(y) << 1)
  }

  // ---- 3-D variant: every third bit, for OPTIMIZE ZORDER BY (a,b,c).
  // Inputs are the shared 8-bit grid (the same normalization the 2-D
  // path uses), so the key is 24 bits. One constant table again
  // generates all three spellings.

  /** (shift, mask) steps spreading an 8-bit value's bits to every THIRD
    * position of a 24-bit value. */
  private val Steps3: Seq[(Int, Long)] = Seq(
    8 -> 0x00F00FL, 4 -> 0x0C30C3L, 2 -> 0x249249L)

  /** Column spelling: spread a non-negative <=8-bit long column to
    * every third bit. */
  def spread3(c: Column): Column =
    Steps3.foldLeft(c) { case (e, (s, m)) =>
      (e.bitwiseOR(shiftleft(e, s))).bitwiseAND(lit(m))
    }

  /** Column spelling: 3-dim Morton key (x bits 0 mod 3, y 1 mod 3,
    * z 2 mod 3). */
  def morton3(x: Column, y: Column, z: Column): Column =
    spread3(x).bitwiseOR(shiftleft(spread3(y), 1))
      .bitwiseOR(shiftleft(spread3(z), 2))

  /** DuckDB-dialect SQL spelling of [[spread3]] (same constants). */
  def spread3Duck(e: String): String =
    Steps3.foldLeft(e) { case (x, (s, m)) => s"((($x) | (($x) << $s)) & $m)" }

  /** DuckDB-dialect SQL spelling of [[morton3]]. */
  def morton3Duck(x: String, y: String, z: String): String =
    s"(${spread3Duck(x)} | (${spread3Duck(y)} << 1) | (${spread3Duck(z)} << 2))"

  /** Plain-JVM reference spelling of the 3-D key. */
  def morton3Long(x: Long, y: Long, z: Long): Long = {
    def sp(v: Long): Long =
      Steps3.foldLeft(v) { case (e, (s, m)) => (e | (e << s)) & m }
    sp(x) | (sp(y) << 1) | (sp(z) << 2)
  }
}

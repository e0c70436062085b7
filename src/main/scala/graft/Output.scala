package graft

import org.apache.spark.sql.DataFrame

/** Pretty table formatter for CLI output — the reference's only sink is
  * `pretty_format_batches` to stdout (/root/reference/crates/cli/src/
  * main.rs:23-28); this mirrors the +---+ box style for golden-test
  * stability. */
object Output {

  def format(df: DataFrame, maxRows: Int = 1000): String = {
    val cols = df.columns
    if (cols.isEmpty) return "++\n++"
    val rows = df.take(maxRows).map(_.toSeq.map(render))
    val widths = cols.indices.map { i =>
      (cols(i).length +: rows.map(_(i).length)).max
    }
    def sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def line(vs: Seq[String]) =
      vs.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    (Seq(sep, line(cols.toSeq), sep) ++ rows.map(line) :+ sep).mkString("\n")
  }

  private def render(v: Any): String = v match {
    case null                => ""
    case b: Array[Byte]      => b.map(x => f"$x%02x").mkString
    // collection.Seq/Map, not the 2.13 immutable default aliases: Spark
    // hands array columns back as mutable.ArraySeq, which the immutable
    // pattern silently misses (falling through to ArraySeq(…).toString)
    case s: scala.collection.Seq[_] =>
      s.map(render).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${render(k)}: ${render(x)}" }
        .mkString("{", ", ", "}")
    case other               => other.toString
  }
}

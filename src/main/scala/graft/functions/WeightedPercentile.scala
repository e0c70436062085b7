package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Weighted exact percentile — DataFusion exposes
  * `approx_percentile_cont_with_weight`; Spark has no weighted percentile,
  * so this is the §2.5 extension point in action: a typed
  * `Aggregator[IN, BUF, OUT]` registered as a SQL UDAF.
  *
  * Exact (not sketch) because the driver's gate hash-compares values: the
  * buffer is a value→total-weight map (bounded by value cardinality),
  * mergeable in any order, and the finish step takes the smallest value
  * whose cumulative weight reaches p·W using integer-only comparisons
  * (2·cum >= W for p=0.5) so results are bit-deterministic. */
final case class ValueWeight(v: Long, w: Long)

class WeightedPercentileAgg(pNumer: Long, pDenom: Long)
    extends Aggregator[ValueWeight, Map[Long, Long], Long] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], a: ValueWeight): Map[Long, Long] =
    b.updated(a.v, b.getOrElse(a.v, 0L) + a.w)

  override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
    y.foldLeft(x) { case (acc, (v, w)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + w)
    }

  override def finish(b: Map[Long, Long]): Long = {
    val total = b.valuesIterator.sum
    var cum = 0L
    val sorted = b.toSeq.sortBy(_._1)
    sorted.find { case (_, w) =>
      cum += w
      cum * pDenom >= pNumer * total
    }.map(_._1).getOrElse(0L)
  }

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    Encoders.kryo[Map[Long, Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object WeightedPercentile {
  /** Register `weighted_p50(value, weight)` for SQL use (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("weighted_p50", udaf(new WeightedPercentileAgg(1L, 2L)))
}

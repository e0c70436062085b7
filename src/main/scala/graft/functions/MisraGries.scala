package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequent-items summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The sketch half of the two-pass verified heavy-hitters operator
  * (q153): a capacity-`m` counter map whose guarantee is that every
  * token with true count > n/(m+1) survives ANY partition layout and
  * merge order, with per-item undercount at most n/(m+1). The summary
  * itself is order-dependent (which NON-heavy tokens ride along depends
  * on arrival order), so the operator never emits it directly — it is
  * the candidate set for an exact verification pass, whose output
  * (tokens with exact count·(m+1) > n) is deterministic and
  * oracle-checkable. DataFusion exposes no frequent-items aggregate;
  * this is the §2.5 extension surface, same posture as
  * [[WeightedPercentileAgg]].
  *
  * Buffer = (counter map bounded by m entries, exact input count n) so
  * candidates and the verification threshold come out of ONE corpus
  * pass. At 100 TB the map-side partial summaries are ≤ m entries each
  * and the final merge is a driver-sized fold — the corpus-wide token
  * distribution (q95's shuffle) is never materialized.
  */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[String, (Map[String, Long], Long), (Map[String, Long], Long)] {
  require(capacity >= 1, "Misra-Gries capacity must be >= 1")

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(
      b: (Map[String, Long], Long), w: String): (Map[String, Long], Long) = {
    val (m, n) = b
    val next =
      if (m.contains(w)) m.updated(w, m(w) + 1L)
      else if (m.size < capacity) m.updated(w, 1L)
      else {
        // full and w absent: the classic decrement-all step (w's own
        // single occurrence is the (capacity+1)-th decremented counter)
        m.iterator.collect { case (k, c) if c > 1L => k -> (c - 1L) }.toMap
      }
    (next, n + 1L)
  }

  override def merge(
      x: (Map[String, Long], Long),
      y: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val combined = y._1.foldLeft(x._1) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    val pruned =
      if (combined.size <= capacity) combined
      else {
        // subtract the (capacity+1)-th largest count from every counter
        // and drop the non-positive ones — the Agarwal et al. merge that
        // keeps total decrement mass ≤ n/(capacity+1) across any tree
        val kth = combined.valuesIterator.toArray.sortBy(-_).apply(capacity)
        combined.iterator
          .collect { case (k, c) if c > kth => k -> (c - kth) }
          .toMap
      }
    (pruned, x._2 + y._2)
  }

  override def finish(b: (Map[String, Long], Long)): (Map[String, Long], Long) = b

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    Encoders.kryo[(Map[String, Long], Long)]
  override def outputEncoder: Encoder[(Map[String, Long], Long)] =
    Encoders.kryo[(Map[String, Long], Long)]
}

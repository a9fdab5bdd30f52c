package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded-heap TOP-K aggregator — per-group top-k as a real
  * AGGREGATE instead of a window rank. The difference is the shuffle:
  * `row_number() OVER (PARTITION BY g ORDER BY v)` must move EVERY row
  * of every group to its reducer and sort it there, while an
  * `Aggregator` participates in partial aggregation — each map task
  * reduces its slice of a group to ≤ k (value, id) pairs before
  * anything crosses the wire, so shuffle volume is
  * O(groups × k × tasks), independent of fact size. At 100 TB
  * per-group top-k over a handful of keys, that's the difference
  * between shuffling the corpus and shuffling kilobytes. (Spark plans
  * typed Aggregators through ObjectHashAggregate with partial-merge —
  * the plan spec asserts both the operator and the partial mode.)
  *
  * Ordering: value DESC, id ASC — the standing deterministic
  * tie-break. The buffer is a sorted Vector trimmed to k (k is small
  * by construction; inserts are O(k)); `merge` concatenates and
  * re-trims, so partial buffers combine associatively and the result
  * is order-insensitive — the property the spec pins against the
  * window formulation.
  *
  * Reference grounding: the reference's rollups surface "top
  * customers" style reports via full sorts
  * (`/root/reference/python/batch_processor.py:64-131`); this is the
  * bounded-state form of the same report.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  require(k > 0, "top-k needs k > 0")

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)],
                      in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size == k && !better(in, buf.last)) buf
    else {
      val (keep, rest) = buf.span(better(_, in))
      (keep ++ (in +: rest)).take(k)
    }

  override def merge(a: Seq[(Long, Long)],
                     b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  // ExpressionEncoder (not kryo): the buffer serializes as a native
  // array-of-struct, so partial buffers shuffle columnar, not as
  // opaque blobs.
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

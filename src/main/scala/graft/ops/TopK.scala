package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-group aggregation as a typed [[Aggregator]].
  *
  * The window formulation (row_number over partitionBy(group) + filter)
  * shuffles EVERY row to its group's partition and sorts there — at 100 TB
  * the shuffle volume is the whole table. This aggregator keeps a k-bounded
  * buffer per group and supports partial merge, so the map side reduces each
  * (group, partition) to at most k entries before anything crosses the wire:
  * shuffle volume drops from O(rows) to O(groups × k × partitions), and no
  * per-group sort of the full data ever happens. This is the aggregation
  * Spark's built-ins cannot express (max_by keeps one row, collect_list is
  * unbounded) — the designed use of the typed Aggregator surface.
  *
  * Ordering inside the buffer is (value desc, id asc) — ties break on the
  * id, keeping results bit-identical across partitionings and engines.
  */
class TopKByValue(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ordered(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double))
      : Seq[(Double, Long)] = {
    val (id, v) = in
    // fast reject: full buffer and the new entry sorts after the floor
    if (buf.length == k) {
      val (fv, fid) = buf.last
      if (v < fv || (v == fv && id > fid)) return buf
    }
    ordered((v, id) +: buf)
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)])
      : Seq[(Double, Long)] = ordered(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

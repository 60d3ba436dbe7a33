package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]].
  *
  * k bounded counters per partial state; any item with true frequency
  * > n/(k+1) is guaranteed to survive to the final candidate set (the
  * classic MG deterministic guarantee), so k = ceil(1/support) makes the
  * sketch a sound candidate filter for `freq > n * support`.
  *
  * Unlike `DataFrame.stat.freqItems` — which runs its own aggregate action
  * EAGERLY at call time — this is a plain lazy aggregation: map-side
  * partials are k-bounded MG states, and `merge` is the mergeable-summaries
  * combine (pointwise count sum, then subtract the (k+1)-th largest count
  * and drop non-positives), so shuffle volume is O(k × partitions)
  * regardless of input rows. That mergeability is exactly why an MG sketch
  * is the 100 TB hot-key detector: per-shard states union without re-scans.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Seq[(String, Long)], Seq[String]] {

  override def zero: Seq[(String, Long)] = Nil

  override def reduce(buf: Seq[(String, Long)], item: String)
      : Seq[(String, Long)] = {
    val i = buf.indexWhere(_._1 == item)
    if (i >= 0) buf.updated(i, (item, buf(i)._2 + 1L))
    else if (buf.length < k) buf :+ (item -> 1L)
    // full buffer, new item: decrement every counter (the MG step that
    // charges one occurrence of k+1 distinct items against each other)
    else buf.collect { case (w, c) if c > 1L => (w, c - 1L) }
  }

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)])
      : Seq[(String, Long)] = {
    val summed = (a ++ b).groupMapReduce(_._1)(_._2)(_ + _).toSeq
    val kept =
      if (summed.length <= k) summed
      else {
        // subtract the (k+1)-th largest count from all, keep positives —
        // the Agarwal et al. mergeable-summaries MG combine
        val cut = summed.map(_._2).sorted(Ordering[Long].reverse)(k)
        summed.collect { case (w, c) if c > cut => (w, c - cut) }
      }
    // canonical order: partial-merge association order must not leak into
    // the state (and therefore into the finished candidate list)
    kept.sortBy(_._1)
  }

  override def finish(r: Seq[(String, Long)]): Seq[String] =
    r.map(_._1).sorted

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

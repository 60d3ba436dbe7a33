package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-capacity Misra-Gries partial state: parallel item/count arrays of
  * capacity k (slots ≥ `n` are dead — null/0 — and only exist so the arrays
  * never reallocate), plus the live-entry count. Contents, not array order,
  * define the state: `finish` sorts, and `merge` re-canonicalizes.
  */
case class MGState(items: Array[String], counts: Array[Long], n: Int)

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]].
  *
  * k bounded counters per partial state; any item with true frequency
  * > n/(k+1) is guaranteed to survive to the final candidate set (the
  * classic MG deterministic guarantee), so k = ceil(1/support) makes the
  * sketch a sound candidate filter for `freq > n * support`. The guarantee
  * holds under ANY partitioning of the input across partial states (the
  * Agarwal et al. mergeable-summaries combine) — the property spec
  * (MisraGriesPropertySpec) pins exactly that.
  *
  * Unlike `DataFrame.stat.freqItems` — which runs its own aggregate action
  * EAGERLY at call time — this is a plain lazy aggregation: map-side
  * partials are k-bounded MG states, and `merge` is the mergeable-summaries
  * combine (pointwise count sum, then subtract the (k+1)-th largest count
  * and drop non-positives), so shuffle volume is O(k × partitions)
  * regardless of input rows. That mergeability is exactly why an MG sketch
  * is the 100 TB hot-key detector: per-shard states union without re-scans.
  *
  * Hot path is allocation-free: `reduce` mutates the fixed-capacity arrays
  * in place (an increment touches one array slot; the decrement-all step
  * compacts in place), so a 100 TB scan generates no per-row garbage — the
  * only allocations are the ≤ k buffer-growth copies and the per-partition
  * `merge`/`finish` canonicalization. NULL input items are skipped (a null
  * key can never be a reportable heavy hitter, and admitting one would NPE
  * the canonical sort in merge/finish).
  */
class MisraGries(k: Int) extends Aggregator[String, MGState, Seq[String]] {

  /** Fresh arrays per call: zero() runs once per aggregation group and the
    * state is mutated in place thereafter — a shared instance would alias
    * every group's buffer.
    */
  override def zero: MGState = MGState(new Array[String](k), new Array[Long](k), 0)

  override def reduce(buf: MGState, item: String): MGState = {
    if (item == null) return buf
    val items = buf.items
    val counts = buf.counts
    var i = 0
    while (i < buf.n) {
      if (items(i) == item) { counts(i) += 1L; return buf }
      i += 1
    }
    if (buf.n < k) {
      items(buf.n) = item
      counts(buf.n) = 1L
      buf.copy(n = buf.n + 1)
    } else {
      // full buffer, new item: decrement every counter (the MG step that
      // charges one occurrence of k+1 distinct items against each other),
      // compacting survivors to the front in place
      var w = 0
      var r = 0
      while (r < k) {
        if (counts(r) > 1L) {
          items(w) = items(r)
          counts(w) = counts(r) - 1L
          w += 1
        }
        r += 1
      }
      // clear dead slots so serialization never leaks stale items
      var z = w
      while (z < k) { items(z) = null; counts(z) = 0L; z += 1 }
      buf.copy(n = w)
    }
  }

  override def merge(a: MGState, b: MGState): MGState = {
    val summed = (a.items.take(a.n) zip a.counts.take(a.n))
      .++(b.items.take(b.n) zip b.counts.take(b.n))
      .groupMapReduce(_._1)(_._2)(_ + _).toArray
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
    val canon = kept.sortBy(_._1)
    MGState(canon.map(_._1), canon.map(_._2), canon.length)
  }

  override def finish(r: MGState): Seq[String] =
    r.items.take(r.n).toSeq.sorted

  override def bufferEncoder: Encoder[MGState] = ExpressionEncoder[MGState]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

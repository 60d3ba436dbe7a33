package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) parameters and the
  * shared index math: D rows × W counters, addressed by Kirsch-Mitzenmacher
  * double hashing over a caller-supplied 64-bit key hash — the same
  * build/probe-share-one-hash-expression discipline as
  * [[graft.expressions.Bloom]], so the aggregator's reduce (JVM) and the
  * estimate (Column expression) can never disagree on a position.
  *
  * Guarantees: estimate ≥ true count always (counters only ever
  * over-count), and ≤ true + ε·N with probability 1−δ where ε = e/W
  * (≈0.0027 at W=1024) and δ = e^−D (D=4). The state is one flat long
  * array whose merge is pointwise addition — the textbook mergeable
  * summary, so per-shard sketches union without re-scans: the 100 TB
  * frequency-tracking path (per-partition partials, O(32 KiB × partitions)
  * shuffle, mirroring q78's HLL-union story for frequencies instead of
  * cardinalities).
  */
object CountMin {
  val D = 4
  /** Power of two so positioning is a single mask. */
  val W = 1024

  /** Row-r counter position for key-hash h (JVM side). */
  def pos(h: Long, r: Int): Int = {
    val h2 = (h >>> 32) | 1L
    ((h + r * h2) & (W - 1)).toInt
  }

  /** The same position as a Column over a 64-bit hash column (probe side).
    * Returns the 1-based flat index into the finished state array.
    */
  def posCol(h: Column, r: Int): Column = {
    val h2 = shiftrightunsigned(h, 32).bitwiseOR(lit(1L))
    (h + lit(r.toLong) * h2).bitwiseAND(lit((W - 1).toLong)) +
      lit((r * W + 1).toLong)
  }

  /** Min-over-rows estimate for a key-hash column against a state array
    * column (the finished sketch).
    */
  def estimate(state: Column, h: Column): Column =
    least((0 until D).map(r => element_at(state, posCol(h, r).cast("int"))): _*)
}

/** The sketch build as a typed [[Aggregator]]: reduce bumps D counters in
  * place, merge is pointwise add. Input is the key's 64-bit hash
  * (xxhash64 in the plan), not the key — hashing stays in codegen'd
  * expression space and build/probe share the hash by construction.
  */
class CountMinAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](CountMin.D * CountMin.W)

  override def reduce(st: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < CountMin.D) {
      st(r * CountMin.W + CountMin.pos(h, r)) += 1L
      r += 1
    }
    st
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(st: Array[Long]): Array[Long] = st

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator

import graft.expressions.Bloom

/** Distributed Bloom-filter build as a typed [[Aggregator]]: the state is the
  * raw 16 KiB bit array, `reduce` sets a key's [[Bloom.NumHashes]] bits in
  * place, `merge` is bytewise OR — the textbook mergeable summary, so the
  * build is one partial-aggregated pass over the key column with shuffle
  * volume O(16 KiB × partitions) no matter how many keys went in. Contrast
  * `DataFrame.stat.bloomFilter`, which runs an EAGER action and returns the
  * filter to the driver; this stays a lazy aggregation composable into any
  * plan (and the resulting one-row frame broadcasts straight back out as the
  * probe side's build input — the driver never holds the filter at all).
  *
  * Input is the key's 64-bit hash (xxhash64 computed in the plan), not the
  * key itself: hashing stays in codegen'd expression space, the aggregator
  * touches 8 bytes per row, and build/probe agree on the hash by sharing the
  * SAME upstream expression.
  */
class BloomFilterAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {

  /** Fresh zeroed table per aggregation group (mutated in place after). */
  override def zero: Array[Byte] = new Array[Byte](Bloom.NumBytes)

  override def reduce(bits: Array[Byte], h: Long): Array[Byte] = {
    Bloom.add(bits, h)
    bits
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Bloom.or(a, b)

  override def finish(bits: Array[Byte]): Array[Byte] = bits

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

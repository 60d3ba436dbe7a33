package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Shared Bloom-filter kernel: a fixed 2^17-bit (16 KiB) filter addressed by
  * Kirsch-Mitzenmacher double hashing (h_i = h1 + i·h2) over a caller-supplied
  * 64-bit hash (xxhash64 upstream). One static implementation serves the
  * build side (the [[graft.ops.BloomFilterAgg]] aggregator's reduce), the
  * probe side (the [[BloomMightContain]] expression, interpreted AND
  * generated code), and the oracle-facing spec — the three can never drift.
  *
  * The size is deliberately fixed rather than sized-per-build: a membership
  * pre-filter for decontamination broadcasts ONE filter to every executor,
  * and 16 KiB yields a <1e-3 false-positive rate for benchmark-suite
  * cardinalities (≤ ~10k distinct shingles at k=5, m/n ≥ 13 bits/key) while
  * costing less network than a single parquet footer. False positives are
  * SEMANTICALLY FREE in every graft use: the filter only prunes the
  * candidate set ahead of an exact confirm join (t109), so correctness never
  * depends on the rate — only the pruning power does.
  */
object Bloom {
  /** Filter width in bits (power of two so probe masking is a single AND). */
  val NumBits: Int = 1 << 17
  val NumBytes: Int = NumBits / 8
  /** Probes per key; with m/n ≥ 13 the optimal k ≈ 9, but 5 keeps probe
    * cost low and still lands ~1e-3 FP — the pre-filter sweet spot.
    */
  val NumHashes: Int = 5

  /** Set key `h`'s bits in `bits` (mutates; build side only). */
  def add(bits: Array[Byte], h: Long): Unit = {
    val h2 = (h >>> 32) | 1L // odd -> full-period stride over the table
    var i = 0
    while (i < NumHashes) {
      val pos = ((h + i * h2) & (NumBits - 1)).toInt
      bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  /** Probe: true iff every one of key `h`'s bits is set (no false
    * negatives by construction). Static so generated code can call it.
    */
  def mightContain(bits: Array[Byte], h: Long): Boolean = {
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < NumHashes) {
      val pos = ((h + i * h2) & (NumBits - 1)).toInt
      if ((bits(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Bytewise OR of `b` into `a` (mutates `a`; the aggregator merge). */
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
}

/** Native membership probe `bloom_might_contain(filter, hash)` — stays inside
  * whole-stage codegen (no UDF boundary) so a 100 TB pre-filter scan pays
  * five masked loads per row and nothing else.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bits: Any, h: Any): Any =
    Bloom.mightContain(bits.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, h) => s"graft.expressions.Bloom.mightContain($b, $h)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

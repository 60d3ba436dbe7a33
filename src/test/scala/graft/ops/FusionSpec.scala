package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec

/** Reciprocal-rank fusion semantics (the t150 engine). Exact output is
  * oracle-checked at sf0.001/sf0.01; here the fusion RULES are pinned on
  * synthetic rank lists where the expectations are hand-computable:
  *  - the join is FULL OUTER: a doc ranked by only one modality stays in
  *    the race (and wins the fused list when the lists are disjoint) —
  *    an inner join would silently require dual coverage;
  *  - RRF's known bias is executable: two mediocre appearances beat one
  *    top single-modality appearance (min dual sum 2·⌊1e6/65⌋ = 30768 >
  *    max single term ⌊1e6/61⌋ = 16393);
  *  - each term is the integer quantization 1000000 div (60+rank), summed
  *    as BIGINTs — hand-checked values, no float anywhere.
  * Plus self-consistency of the real t150 output: rrf_q is recomputable
  * from the emitted lex_rn/dense_rn columns alone.
  */
class FusionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rrf fusion: single-modality docs survive and hand-computed ranks") {
    val s = spark
    import s.implicits._
    // q1: disjoint lists — the lex-only doc at lex rank 1 must WIN the
    // fused list (full-outer semantics; doc_id tiebreak vs the dense-only
    // doc with the same rrf term)
    // q2: a doc in BOTH lists at poor ranks (4, 5) vs a single-modality
    // rank-1 doc — the dual doc must outrank it (RRF's flat 1/(60+r))
    val lex = Seq(
      (1L, 101L, 1L), (1L, 102L, 2L),
      (2L, 201L, 1L), (2L, 210L, 4L)).toDF("query_id", "doc_id", "lex_rn")
    val dense = Seq(
      (1L, 103L, 1L), (1L, 104L, 2L),
      (2L, 210L, 5L)).toDF("query_id", "doc_id", "dense_rn")
    val fused = FusionOps.rrfFuse(lex, dense, k = 10)
      .orderBy("query_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    val q1 = fused.filter(_._1 == 1L)
    // 1e6 div 61 = 16393, 1e6 div 62 = 16129 — doc 101 (lex-only) ties
    // doc 103 (dense-only) at 16393 and wins on doc_id; absent modality
    // surfaces as rank 0
    assert(q1.toSeq == Seq(
      (1L, 101L, 1L, 0L, 16393L, 1L),
      (1L, 103L, 0L, 1L, 16393L, 2L),
      (1L, 102L, 2L, 0L, 16129L, 3L),
      (1L, 104L, 0L, 2L, 16129L, 4L)), q1.toSeq.toString)

    val q2 = fused.filter(_._1 == 2L)
    // doc 210: 1e6 div 64 + 1e6 div 65 = 15625 + 15384 = 31009 beats the
    // lex-rank-1-only doc 201 at 16393
    assert(q2.toSeq == Seq(
      (2L, 210L, 4L, 5L, 31009L, 1L),
      (2L, 201L, 1L, 0L, 16393L, 2L)), q2.toSeq.toString)
  }

  test("t150 output is rank-contiguous and rrf_q is self-consistent") {
    val out = FusionOps.t150HybridFusion(spark, sf).persist()
    assert(out.count() > 0)
    assert(out.filter(col("rn") > 3).count() == 0)
    // ranks contiguous from 1 per query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rn")
    assert(out.withColumn("prev", lag("rn", 1).over(w))
      .filter((col("prev").isNull && col("rn") =!= 1) ||
        (col("prev").isNotNull && col("rn") =!= col("prev") + 1))
      .count() == 0)
    // rrf_q recomputable from the emitted ranks alone (rank 0 = absent)
    val bad = out.filter(col("rrf_q") =!=
      (when(col("lex_rn") === 0, lit(0L))
        .otherwise(expr("1000000 div (60 + lex_rn)")) +
       when(col("dense_rn") === 0, lit(0L))
        .otherwise(expr("1000000 div (60 + dense_rn)"))))
    assert(bad.count() == 0, "rrf_q must equal the quantized term sum")
    // at least one doc reached the fused list through a single modality
    assert(out.filter(col("lex_rn") === 0 || col("dense_rn") === 0)
      .count() > 0, "expected some single-modality fused entries")
    out.unpersist()
    CacheRegistry.harness.release()
  }
}

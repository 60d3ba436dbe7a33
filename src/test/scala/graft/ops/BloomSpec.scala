package graft.ops

import org.apache.spark.sql.functions._
import graft.betfair.SparkSpec
import graft.expressions.Bloom

/** Bloom pre-filter contract: no false negatives ever, useful pruning in
  * practice, and t109 ≡ t67 (the filter changes cost, never the answer).
  */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kernel: zero false negatives; merge is exact OR") {
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(4096)(rnd.nextLong())
    val (a, b) = (new Array[Byte](Bloom.NumBytes),
      new Array[Byte](Bloom.NumBytes))
    keys.take(2048).foreach(Bloom.add(a, _))
    keys.drop(2048).foreach(Bloom.add(b, _))
    val merged = Bloom.or(a.clone(), b)
    assert(keys.forall(Bloom.mightContain(merged, _)),
      "a member key probed negative — false negatives must be impossible")
  }

  test("kernel: false-positive rate at benchmark cardinality is < 1%") {
    val rnd = new scala.util.Random(11)
    val bits = new Array[Byte](Bloom.NumBytes)
    (0 until 10000).foreach(_ => Bloom.add(bits, rnd.nextLong()))
    val probes = 100000
    val fp = (0 until probes).count(_ => Bloom.mightContain(bits, rnd.nextLong()))
    assert(fp < probes / 100, s"FP rate ${fp.toDouble / probes} too high")
  }

  test("t109 output is byte-identical to t67 (pre-filter changes cost, not answer)") {
    val exact = TextOps.t67Decontaminate(spark, sf)
    val bloom = TextOps.t109BloomDecontaminate(spark, sf)
    assert(exact.exceptAll(bloom).count() == 0 &&
      bloom.exceptAll(exact).count() == 0)
    CacheRegistry.harness.release()
  }

  test("probe stays in whole-stage codegen; confirm join is broadcast") {
    val df = TextOps.t109BloomDecontaminate(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"probe expression not in the plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"exact confirm not broadcast:\n$plan")
    // the distributed build must be a partial aggregation (mergeable state),
    // not an eager driver-side stat action
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), s"no aggregate build stage:\n$plan")
    CacheRegistry.harness.release()
  }
}
